"""Image-to-text recall scorer (reference eval/evaluation_tr.py mirror).

CLI: python -m nans_clip_tpu.eval.evaluation_tr GOLDEN PRED OUT.json
"""

from nans_clip_tpu.eval.evaluation import main

if __name__ == "__main__":
    main(query_key="image_id", gallery_key="text_ids")
