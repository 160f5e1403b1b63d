CSRC := nans_clip_tpu/csrc

.PHONY: native test bench clean

native: $(CSRC)/libnpack.so $(CSRC)/libnanstok.so

$(CSRC)/libnpack.so: $(CSRC)/npack.cpp
	g++ -O3 -shared -fPIC $< -o $@ -ljpeg -pthread

$(CSRC)/unicode_tables.inc: $(CSRC)/gen_unicode_tables.py
	python $< $@

$(CSRC)/libnanstok.so: $(CSRC)/tokenizer.cpp $(CSRC)/unicode_tables.inc
	cd $(CSRC) && g++ -O2 -shared -fPIC tokenizer.cpp -o libnanstok.so

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f $(CSRC)/*.so $(CSRC)/unicode_tables.inc
