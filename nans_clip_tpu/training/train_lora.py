"""LoRA finetuning CLI — behavioral twin of reference ``train_lora.py``.

* frozen base model + ``logit_scale`` (train_lora.py:144-152); only the
  adapter pytree is optimized (AdamW, no decay exclusions needed — LoRA
  matrices want decay);
* InfoNCE with label smoothing 0.05 (train_lora.py:96-110);
* gradient accumulation keeps full-negative semantics: the reference
  collects features across ``accum_freq`` microbatches and backprops one
  concatenated loss (train_lora.py:242-269) — here that's the scan+remat
  accumulation from the main trainer, which is the same gradient;
* warmup-ratio + cosine schedule (train_lora.py:186-195);
* best-val adapter-only checkpoints + ``training_log.csv``
  (train_lora.py:210-321).

Usage:
  python -m nans_clip_tpu.training.train_lora \
      --train-data DIR/train --val-data DIR/valid --resume ckpt.pt \
      --vision-model ViT-B-16 --text-model RoBERTa-wwm-ext-base-chinese \
      --lora-rank 4 --lora-alpha 16 --epochs 30
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nans_clip_tpu.data import DataLoader, PairDataset, preprocess_images
from nans_clip_tpu.eval.model_io import load_eval_model
from nans_clip_tpu.models.clip import encode_image, encode_text, normalize
from nans_clip_tpu.models.lora import (count_lora_params, init_lora, load_lora,
                                       merge_lora, save_lora)
from nans_clip_tpu.parallel.loss import clip_loss
from nans_clip_tpu.training.trainer import cosine_with_warmup


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train-data", required=True)
    p.add_argument("--val-data", default=None)
    p.add_argument("--resume", default=None,
                   help="base model checkpoint (.pt or orbax dir); required "
                        "unless --tiny-model")
    p.add_argument("--tiny-model", action="store_true",
                   help="2-layer 64-wide debug config (configs.tiny_config, "
                        "same as the main trainer's flag); --resume optional")
    p.add_argument("--vision-model", default="ViT-B-16")
    p.add_argument("--text-model", default="RoBERTa-wwm-ext-base-chinese")
    p.add_argument("--output-dir", default="./lora_output")
    p.add_argument("--lora-rank", type=int, default=4)
    p.add_argument("--lora-alpha", type=float, default=16.0)
    p.add_argument("--text-only", action="store_true")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--accum-freq", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--wd", type=float, default=0.01)
    p.add_argument("--warmup-ratio", type=float, default=0.1)
    p.add_argument("--label-smoothing", type=float, default=0.05)
    p.add_argument("--context-length", type=int, default=52)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--num-threads", type=int, default=8)
    p.add_argument("--precision", default="bf16")
    return p.parse_args(argv)


def make_lora_step(cfg, options, alpha, label_smoothing, accum, tx):
    # NOTE: base params are a traced ARGUMENT, never a closure — closing over
    # a 188M-param pytree embeds it as XLA constants and the compile explodes.
    # The reference trains with model.train() (train_lora.py:219), i.e. BERT
    # hidden/attention dropout 0.1 ACTIVE — the train path mirrors that;
    # eval stays deterministic.
    import dataclasses as _dc
    train_opts = _dc.replace(options, deterministic=False)

    def encode_batch(base_params, adapters, images, texts, rng, opts):
        params = merge_lora(base_params, adapters, alpha)
        b = images.shape[0]
        if accum <= 1:
            return (encode_image(params, cfg, images, opts),
                    encode_text(params, cfg, texts, opts, rng=rng))
        m, micro = accum, b // accum
        im = images.reshape(m, micro, *images.shape[1:])
        tx_r = texts.reshape(m, micro, *texts.shape[1:])

        def enc(_, mb):
            j, im_j, tx_j = mb
            return None, (encode_image(params, cfg, im_j, opts),
                          encode_text(params, cfg, tx_j, opts,
                                      rng=jax.random.fold_in(rng, j)))
        _, (fi, ft) = jax.lax.scan(jax.checkpoint(enc), None,
                                   (jnp.arange(m), im, tx_r))
        return fi.reshape(b, -1), ft.reshape(b, -1)

    def loss_fn(adapters, base_params, images, texts, rng,
                opts=train_opts):
        fi, ft = encode_batch(base_params, adapters, images, texts, rng, opts)
        scale = jnp.exp(base_params["logit_scale"].astype(jnp.float32))
        loss, metrics = clip_loss(normalize(fi), normalize(ft), scale,
                                  label_smoothing=label_smoothing,
                                  constrain=False)
        return loss, metrics

    @jax.jit
    def train_step(base_params, adapters, opt_state, images, texts, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            adapters, base_params, images, texts, rng)
        updates, opt_state = tx.update(grads, opt_state, adapters)
        adapters = optax.apply_updates(adapters, updates)
        return adapters, opt_state, loss, metrics

    @jax.jit
    def eval_step(base_params, adapters, images, texts):
        loss, _ = loss_fn(adapters, base_params, images, texts,
                          jax.random.PRNGKey(0), opts=options)
        return loss
    return train_step, eval_step


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s | %(levelname)s | %(message)s")

    if not (args.resume or args.tiny_model):
        raise SystemExit("--resume is required unless --tiny-model")
    tiny = None
    if args.tiny_model:
        from nans_clip_tpu.configs import tiny_config
        tiny = tiny_config()
    cfg, params, batch_stats, options = load_eval_model(
        args.vision_model, args.text_model, args.resume, args.precision,
        cfg=tiny)
    assert not cfg.is_resnet, "LoRA targets transformer towers (ViT models)"

    adapters = init_lora(jax.random.PRNGKey(args.seed), params,
                         rank=args.lora_rank, text_only=args.text_only)
    n_lora = count_lora_params(adapters)
    n_total = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    logging.info("LoRA params: %d (%.4f%% of %d)", n_lora,
                 100.0 * n_lora / n_total, n_total)

    resolution = cfg.vision.image_resolution
    train_ds = PairDataset(args.train_data)
    micro = args.batch_size
    loader = DataLoader(train_ds, batch_size=micro * args.accum_freq,
                        decode_size=resolution, context_length=args.context_length,
                        shuffle=True, seed=args.seed, num_threads=args.num_threads)
    val_loader = None
    if args.val_data:
        val_loader = DataLoader(PairDataset(args.val_data), batch_size=micro,
                                decode_size=resolution,
                                context_length=args.context_length,
                                shuffle=True, seed=args.seed,
                                num_threads=args.num_threads)

    total_steps = loader.num_batches * args.epochs
    warmup_steps = max(1, int(total_steps * args.warmup_ratio))

    # Shared warmup+cosine helper (trainer.py). Its (step+1)/warmup form
    # gives a non-zero lr on the very first step, unlike the fork's
    # torch get_cosine_schedule_with_warmup which wastes step 0 at lr=0.
    schedule = cosine_with_warmup(args.lr, warmup_steps, total_steps)

    tx = optax.adamw(schedule, weight_decay=args.wd)
    opt_state = tx.init(adapters)
    train_step, eval_step = make_lora_step(cfg, options, args.lora_alpha,
                                           args.label_smoothing, args.accum_freq, tx)

    log_path = os.path.join(args.output_dir, "training_log.csv")
    with open(log_path, "w") as f:
        f.write("epoch,train_loss,val_loss,lr,is_best\n")

    rng = jax.random.PRNGKey(args.seed)
    best_val = float("inf")
    step = 0
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        # accumulate the loss ON DEVICE: float(loss) per step would force a
        # device->host sync (a fixed ~27.5 ms RTT on tunneled TPU hosts)
        # between dispatches; one conversion per epoch costs one RTT total
        loss_sum, nb = None, 0
        for batch in loader:
            rng, arng, srng = jax.random.split(rng, 3)
            im = preprocess_images(arng, jnp.asarray(batch.images), resolution,
                                   augment=False)
            adapters, opt_state, loss, metrics = train_step(
                params, adapters, opt_state, im, jnp.asarray(batch.texts), srng)
            loss_sum = loss if loss_sum is None else loss_sum + loss
            nb += 1
            step += 1
        train_loss = float(loss_sum) / nb if nb else float("nan")

        val_loss = float("nan")
        if val_loader is not None:
            vsum, vn = None, 0
            for batch in val_loader:
                im = preprocess_images(jax.random.PRNGKey(0),
                                       jnp.asarray(batch.images), resolution,
                                       augment=False)
                v = eval_step(params, adapters, im, jnp.asarray(batch.texts))
                vsum = v if vsum is None else vsum + v
                vn += 1
            val_loss = float(vsum) / vn if vn else float("nan")

        is_best = val_loss < best_val if val_loader is not None else True
        if is_best:
            best_val = val_loss if val_loader is not None else train_loss
            save_lora(os.path.join(args.output_dir, "best_lora.npz"), adapters,
                      {"epoch": epoch, "val_loss": val_loss, "rank": args.lora_rank,
                       "alpha": args.lora_alpha})
        lr_now = float(schedule(step))
        with open(log_path, "a") as f:
            f.write(f"{epoch},{train_loss:.6f},{val_loss:.6f},{lr_now:.8f},{int(is_best)}\n")
        logging.info("epoch %d | train %.4f | val %.4f | lr %.2e | best=%s",
                     epoch, train_loss, val_loss, lr_now, is_best)

    save_lora(os.path.join(args.output_dir, "last_lora.npz"), adapters,
              {"epoch": args.epochs - 1, "rank": args.lora_rank,
               "alpha": args.lora_alpha})
    logging.info("done. best val loss %.4f; adapters in %s", best_val, args.output_dir)
    return adapters


if __name__ == "__main__":
    main()
