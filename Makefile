CSRC := nans_clip_tpu/csrc

.PHONY: native test smoke bench clean

native: $(CSRC)/libnpack.so $(CSRC)/libnanstok.so

$(CSRC)/libnpack.so: $(CSRC)/npack.cpp
	g++ -O3 -shared -fPIC $< -o $@ -ljpeg -pthread

$(CSRC)/unicode_tables.inc: $(CSRC)/gen_unicode_tables.py
	python $< $@

$(CSRC)/libnanstok.so: $(CSRC)/tokenizer.cpp $(CSRC)/unicode_tables.inc
	cd $(CSRC) && g++ -O2 -shared -fPIC tokenizer.cpp -o libnanstok.so

test:
	python -m pytest tests/ -q

# fast pre-commit subset (~2-3 min): model/op/tokenizer/data correctness
# without the CLI-cycle and parity-vs-reference integration modules
smoke:
	python -m pytest tests/test_ops.py tests/test_fused_block.py \
	  tests/test_tokenizer.py tests/test_data.py tests/test_configs.py \
	  tests/test_trainer.py -q

bench:
	python bench.py

clean:
	rm -f $(CSRC)/*.so $(CSRC)/unicode_tables.inc
