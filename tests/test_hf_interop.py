"""HF ``ChineseCLIPModel`` interop: numerical parity + roundtrip.

Builds a tiny randomly-initialized ``transformers.ChineseCLIPModel`` (the
HF port of the reference, which is how most Hub users hold the weights),
converts its state_dict through ``utils/hf_interop.py``, and checks our
towers reproduce ``get_image_features`` / ``get_text_features`` and the
similarity logits. Also roundtrips our pytree through the HF layout.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nans_clip_tpu.configs import CLIPConfig, TextConfig, VisionConfig  # noqa: E402
from nans_clip_tpu.models import ModelOptions  # noqa: E402
from nans_clip_tpu.models.clip import (encode_image, encode_text,
                                       init_clip)  # noqa: E402
from nans_clip_tpu.utils.hf_interop import (config_from_hf,
                                            hf_to_reference_state_dict,
                                            load_hf_checkpoint,
                                            reference_to_hf_state_dict)  # noqa: E402
from nans_clip_tpu.utils.torch_interop import (normalize_state_dict,
                                               params_from_state_dict,
                                               state_dict_from_params)  # noqa: E402

OPTS = ModelOptions(attn_impl="xla")


def _tiny_hf_config():
    from transformers import (ChineseCLIPConfig, ChineseCLIPTextConfig,
                              ChineseCLIPVisionConfig)
    tc = ChineseCLIPTextConfig(
        vocab_size=120, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=32, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    vc = ChineseCLIPVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=256, image_size=32, patch_size=16)
    return ChineseCLIPConfig(text_config=tc.to_dict(),
                             vision_config=vc.to_dict(), projection_dim=48)


def _tiny_hf_model():
    from transformers import ChineseCLIPModel
    torch.manual_seed(0)
    return ChineseCLIPModel(_tiny_hf_config()).float().eval()


def _our_cfg():
    return CLIPConfig(
        embed_dim=48,
        vision=VisionConfig(embed_dim=48, image_resolution=32, layers=2,
                            width=64, patch_size=16, head_width=32),
        text=TextConfig(vocab_size=120, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=128,
                        max_position_embeddings=32),
    )


def _inputs(b=3):
    rs = np.random.RandomState(0)
    img = rs.randn(b, 3, 32, 32).astype(np.float32)
    txt = np.zeros((b, 16), np.int64)
    for i, n in enumerate((16, 10, 5)[:b]):   # incl. padded rows
        txt[i, 0] = 101
        txt[i, 1:n - 1] = rs.randint(10, 100, n - 2)
        txt[i, n - 1] = 102
    return img, txt


def test_hf_checkpoint_parity():
    model = _tiny_hf_model()
    cfg = _our_cfg()
    # through normalize_state_dict: exercises the auto-detect path every
    # .pt entry point uses (api.load, --clip-weight-path, ...)
    sd = normalize_state_dict(model.state_dict())
    params, _ = params_from_state_dict(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)

    img, txt = _inputs()
    # NOTE: this transformers version's get_text_features reads
    # pooler_output, which ChineseCLIPModel builds with
    # add_pooling_layer=False (None -> crash); forward() implements the
    # real semantics (CLS row through text_projection, L2-normalized) —
    # compare against that, plus the unnormalized image path.
    with torch.no_grad():
        ref_img = model.get_image_features(torch.from_numpy(img)).numpy()
        out = model(input_ids=torch.from_numpy(txt),
                    pixel_values=torch.from_numpy(img),
                    attention_mask=torch.from_numpy((txt != 0).astype(np.int64)))
        ref_txt_n = out.text_embeds.numpy()
        ref_logits = out.logits_per_image.numpy()

    ours_img = np.asarray(encode_image(
        params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)), OPTS))
    ours_txt = encode_text(params, cfg, jnp.asarray(txt.astype(np.int32)), OPTS)
    ours_txt_n = np.asarray(
        ours_txt / jnp.linalg.norm(ours_txt, axis=-1, keepdims=True))
    ours_img_n = ours_img / np.linalg.norm(ours_img, axis=-1, keepdims=True)
    ours_logits = (np.exp(np.asarray(params["logit_scale"], np.float32))
                   * ours_img_n @ ours_txt_n.T)

    np.testing.assert_allclose(ours_img, ref_img, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours_txt_n, ref_txt_n, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours_logits, ref_logits, atol=2e-3, rtol=2e-3)


def test_hf_roundtrip_exact():
    cfg = _our_cfg()
    params, _ = init_clip(jax.random.PRNGKey(1), cfg)
    ref_sd = state_dict_from_params(jax.tree.map(np.asarray, params), cfg)
    back = hf_to_reference_state_dict(reference_to_hf_state_dict(ref_sd))
    assert set(back) == set(ref_sd)
    for k in ref_sd:
        np.testing.assert_array_equal(back[k], ref_sd[k], err_msg=k)


def test_hf_unmapped_key_raises():
    with pytest.raises(KeyError, match="unmapped"):
        hf_to_reference_state_dict(
            {"vision_model.mystery.weight": np.zeros(3, np.float32)})


def test_config_from_hf():
    hf = _tiny_hf_config().to_dict()
    cfg = config_from_hf(hf)
    assert cfg.embed_dim == 48
    assert cfg.vision.width == 64 and cfg.vision.heads == 2
    assert cfg.vision.seq_len == 5
    assert cfg.text.intermediate_size == 128
    assert cfg.text.layer_norm_eps == hf["text_config"]["layer_norm_eps"]

    bad = json.loads(json.dumps(hf))
    bad["vision_config"]["hidden_act"] = "gelu"
    with pytest.raises(ValueError, match="quick_gelu"):
        config_from_hf(bad)


def test_save_hf_checkpoint_loads_in_transformers(tmp_path):
    from transformers import ChineseCLIPModel

    from nans_clip_tpu.utils.hf_interop import save_hf_checkpoint
    cfg = _our_cfg()
    params, _ = init_clip(jax.random.PRNGKey(3), cfg)
    params = jax.tree.map(np.asarray, params)
    save_hf_checkpoint(str(tmp_path), params, cfg)

    model, info = ChineseCLIPModel.from_pretrained(
        str(tmp_path), output_loading_info=True)
    assert not info["missing_keys"], info["missing_keys"]
    assert not info["unexpected_keys"], info["unexpected_keys"]
    model = model.float().eval()

    img, txt = _inputs(2)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(txt),
                    pixel_values=torch.from_numpy(img),
                    attention_mask=torch.from_numpy((txt != 0).astype(np.int64)))
    jp = jax.tree.map(jnp.asarray, params)
    ours_img = np.asarray(encode_image(
        jp, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)), OPTS))
    ours_img_n = ours_img / np.linalg.norm(ours_img, axis=-1, keepdims=True)
    np.testing.assert_allclose(ours_img_n, out.image_embeds.numpy(),
                               atol=2e-4, rtol=2e-4)


def test_hf_tokenizer_input_ids_parity():
    """A user switching from the HF stack keeps their input_ids: HF's
    BertTokenizer over the same vocab produces identical CLIP-framed ids
    ([CLS] ... [SEP], pad to 52, truncate) to our tokenize().

    Known, accepted divergences (we follow the REFERENCE, not HF, and
    they are not covered here): (1) Greek capital sigma in word-final
    position — the reference (and we) lowercase with Python's str.lower()
    (Final_Sigma -> ς) while HF lowercases character-wise (σ);
    (2) max_input_chars_per_word — the reference's WordPiece UNKs words
    over 200 chars (bert_tokenizer.py:340), HF over 100. Both are
    irrelevant to the Chinese/ASCII domain.
    """
    import random

    from transformers import BertTokenizer

    from nans_clip_tpu.tokenizer import DEFAULT_VOCAB, tokenize

    hf = BertTokenizer(vocab_file=DEFAULT_VOCAB, do_lower_case=True)
    random.seed(0)
    cjk = [chr(random.randint(0x4E00, 0x9FFF)) for _ in range(200)]
    texts = ["杰尼龟与皮卡丘在Pallet Town玩水枪。",
             "HELLO, Wörld!  Ｆｕｌｌwidth ｔｅｘｔ 123",
             "咖啡☕和tea，混合café au lait…",
             "中文标点：《书名》、“引号”—破折号",
             "x" * 99] + [
        "".join(random.choices(cjk + list("abcdefgh ,.!123"), k=random.randint(1, 80)))
        for _ in range(100)]

    ref_ids = hf(texts, padding="max_length", truncation=True, max_length=52,
                 return_token_type_ids=False)["input_ids"]
    ours = np.asarray(tokenize(texts, context_length=52))
    np.testing.assert_array_equal(ours, np.asarray(ref_ids, np.int64))


def test_load_hf_checkpoint_dir(tmp_path):
    model = _tiny_hf_model()
    model.save_pretrained(tmp_path)
    params, cfg = load_hf_checkpoint(str(tmp_path))
    assert cfg.vision.image_resolution == 32
    img, txt = _inputs(2)
    with torch.no_grad():
        ref_img = model.get_image_features(torch.from_numpy(img)).numpy()
    params = jax.tree.map(jnp.asarray, params)
    ours_img = np.asarray(encode_image(
        params, cfg, jnp.asarray(img.transpose(0, 2, 3, 1)), OPTS))
    np.testing.assert_allclose(ours_img, ref_img, atol=2e-4, rtol=2e-4)


def test_save_hf_checkpoint_processor_side(tmp_path):
    """The exported directory is fully self-contained: the HF processor
    loads from it and reproduces our preprocessing bit-for-bit."""
    from PIL import Image
    from transformers import ChineseCLIPProcessor

    from nans_clip_tpu.tokenizer import tokenize
    from nans_clip_tpu.utils.hf_interop import save_hf_checkpoint
    from nans_clip_tpu.utils.transform import image_transform

    cfg = CLIPConfig(
        embed_dim=48,
        vision=VisionConfig(embed_dim=48, image_resolution=32, layers=2,
                            width=64, patch_size=16, head_width=32),
        text=TextConfig(vocab_size=21128, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=128,
                        max_position_embeddings=64),
    )
    params, _ = init_clip(jax.random.PRNGKey(5), cfg)
    save_hf_checkpoint(str(tmp_path), jax.tree.map(np.asarray, params), cfg)

    proc = ChineseCLIPProcessor.from_pretrained(str(tmp_path))
    rs = np.random.RandomState(0)
    img = Image.fromarray((rs.rand(50, 70, 3) * 255).astype(np.uint8))
    texts = ["杰尼龟与皮卡丘", "hello 世界 123"]
    out = proc(text=texts, images=img, return_tensors="np",
               padding="max_length", truncation=True, max_length=52)

    ours_px = image_transform(32)(img)
    np.testing.assert_array_equal(
        out["pixel_values"][0].transpose(1, 2, 0), ours_px)
    np.testing.assert_array_equal(
        out["input_ids"], np.asarray(tokenize(texts, context_length=52)))


def test_load_from_name_hf_dir(tmp_path):
    from nans_clip_tpu.api import load_from_name

    model = _tiny_hf_model()
    model.save_pretrained(tmp_path)
    m, preprocess = load_from_name(str(tmp_path), options=OPTS)
    assert m.image_resolution == 32
    img, txt = _inputs(2)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(txt),
                    pixel_values=torch.from_numpy(img),
                    attention_mask=torch.from_numpy((txt != 0).astype(np.int64)))
    li, _ = m.get_similarity(jnp.asarray(img.transpose(0, 2, 3, 1)),
                             jnp.asarray(txt.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(li), out.logits_per_image.numpy(),
                               atol=2e-3, rtol=2e-3)

    # resolution override resizes the pos-embed through the same path the
    # published 336px checkpoints use
    m2, _ = load_from_name(str(tmp_path), input_resolution=64, options=OPTS)
    assert m2.image_resolution == 64
    assert m2.params["visual"]["positional_embedding"].shape[0] == 17
    feats = m2.encode_image(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert np.isfinite(np.asarray(feats)).all()


def test_is_hf_layout_majority_vote():
    """A stray ``vision_model.*`` key in a reference-layout dict must NOT
    flip the whole translation (advisor r2: any() gave a misleading
    'unmapped HF keys' error naming the wrong format)."""
    from nans_clip_tpu.utils.hf_interop import is_hf_layout

    ref_keys = {f"visual.transformer.resblocks.{i}.attn.Wqkv.weight": 0
                for i in range(10)}
    ref_keys.update({f"bert.encoder.layer.{i}.attention.self.query.weight": 0
                     for i in range(10)})
    assert not is_hf_layout(ref_keys)
    assert not is_hf_layout({})
    # one stray HF key among 20 reference keys: still reference layout
    mixed = dict(ref_keys, **{"vision_model.embeddings.class_embedding": 0})
    assert not is_hf_layout(mixed)
    # predominantly HF: detected
    hf = {f"vision_model.encoder.layers.{i}.self_attn.q_proj.weight": 0
          for i in range(10)}
    hf["text_projection.weight"] = 0
    assert is_hf_layout(hf)
    assert is_hf_layout(dict(hf, **{"visual.stray": 0}))


def _vocab120_cfg():
    return CLIPConfig(
        embed_dim=48,
        vision=VisionConfig(embed_dim=48, image_resolution=32, layers=2,
                            width=64, patch_size=16, head_width=32),
        text=TextConfig(vocab_size=120, hidden_size=64, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=128,
                        max_position_embeddings=64),
    )


def test_save_hf_checkpoint_vocab_mismatch(tmp_path):
    """Vocab/model size mismatch: warn + model-only export for the default
    vocab, ValueError when the caller explicitly passed the bad vocab_file
    (advisor r2: it used to silently skip the processor side)."""
    import os
    import warnings

    from nans_clip_tpu.utils.hf_interop import save_hf_checkpoint

    cfg = _vocab120_cfg()  # vocab_size=120 != bundled 21128
    params, _ = init_clip(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(np.asarray, params)

    d1 = str(tmp_path / "warned")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        save_hf_checkpoint(d1, params, cfg)
    assert any("vocab" in str(w.message) for w in caught)
    assert os.path.isfile(os.path.join(d1, "model.safetensors"))
    assert not os.path.exists(os.path.join(d1, "vocab.txt"))

    bad_vocab = tmp_path / "bad_vocab.txt"
    bad_vocab.write_text("\n".join(f"tok{i}" for i in range(7)) + "\n",
                         encoding="utf-8")
    with pytest.raises(ValueError, match="120"):
        save_hf_checkpoint(str(tmp_path / "raised"), params, cfg,
                           vocab_file=str(bad_vocab))


def test_save_hf_checkpoint_vocab_no_trailing_newline(tmp_path):
    """A matching vocab WITHOUT a trailing newline must count correctly
    (advisor r2: the old line count was off by one for this case) and
    produce the full processor-side export."""
    import os

    from nans_clip_tpu.utils.hf_interop import save_hf_checkpoint

    cfg = _vocab120_cfg()
    params, _ = init_clip(jax.random.PRNGKey(1), cfg)
    params = jax.tree.map(np.asarray, params)
    vocab = tmp_path / "vocab120.txt"
    vocab.write_text("\n".join(f"tok{i}" for i in range(120)),
                     encoding="utf-8")  # no trailing newline
    out = str(tmp_path / "ok")
    save_hf_checkpoint(out, params, cfg, vocab_file=str(vocab))
    for fname in ("vocab.txt", "tokenizer_config.json",
                  "preprocessor_config.json"):
        assert os.path.isfile(os.path.join(out, fname)), fname


def test_load_from_name_hf_dir_rejects_arch_override(tmp_path):
    """Passing vision_model_name/text_model_name alongside an HF snapshot
    directory raises instead of being silently ignored (advisor r2)."""
    from nans_clip_tpu.api import load_from_name

    model = _tiny_hf_model()
    model.save_pretrained(tmp_path)
    with pytest.raises(ValueError, match="cannot override"):
        load_from_name(str(tmp_path), vision_model_name="ViT-B-16",
                       options=OPTS)
    with pytest.raises(ValueError, match="cannot override"):
        load_from_name(str(tmp_path), text_model_name="RoBERTa-wwm-ext-base-chinese",
                       options=OPTS)
