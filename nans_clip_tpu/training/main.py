"""Training entry point.

TPU-native twin of reference training/main.py: one launch command per host
(``jax.distributed`` handles multi-host; no torch.distributed.launch, no
per-GPU ranks), a ("data","model") mesh instead of DDP, Orbax auto-resume,
optional distillation teacher, and reference-compatible flags
(training/params.py).

Example (single host):
  python -m nans_clip_tpu.training.main \
      --train-data DATADIR/train --val-data DATADIR/valid \
      --vision-model ViT-B-16 --text-model RoBERTa-wwm-ext-base-chinese \
      --batch-size 128 --max-epochs 3 --lr 5e-5 --warmup 100
"""

from __future__ import annotations

import json
import logging
import math
import os
import signal
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nans_clip_tpu.configs import load_config
from nans_clip_tpu.data import DataLoader, PairDataset, preprocess_images
from nans_clip_tpu.models import ModelOptions
from nans_clip_tpu.models.clip import init_clip
from nans_clip_tpu.parallel import create_mesh, shard_params
from nans_clip_tpu.parallel.distributed import global_batch_from_host_batch
from nans_clip_tpu.training.params import parse_args
from nans_clip_tpu.training.trainer import (TrainConfig, create_train_state,
                                            make_eval_step,
                                            make_multi_train_step,
                                            make_train_step,
                                            shard_train_state,
                                            train_state_shardings)
from nans_clip_tpu.utils.checkpoint import (latest_exists, restore_checkpoint,
                                            save_checkpoint)
from nans_clip_tpu.utils.torch_interop import (load_torch_state_dict,
                                               merge_pretrained,
                                               params_from_state_dict)


def setup_logging(log_dir: str, name: str) -> str:
    os.makedirs(os.path.join(log_dir, name), exist_ok=True)
    ts = time.strftime("%Y-%m-%d-%H-%M-%S")
    log_path = os.path.join(log_dir, name, f"out_{ts}.log")
    handlers = [logging.FileHandler(log_path), logging.StreamHandler()]
    logging.basicConfig(level=logging.INFO, handlers=handlers,
                        format=f"%(asctime)s | proc {jax.process_index()} | %(levelname)s | %(message)s",
                        force=True)
    return log_path


def build_model(args):
    cfg = load_config(f"{args.vision_model}@{args.text_model}")
    if getattr(args, "tiny_model", False):
        from nans_clip_tpu.configs import tiny_config
        cfg = tiny_config()
    compute_dtype = None if args.precision == "fp32" else "bfloat16"
    assert not (args.tp > 1 and args.pp > 1), "--tp and --pp are exclusive"
    train_options = ModelOptions(attn_impl=args.attn_impl,
                                 remat=args.grad_checkpointing,
                                 compute_dtype=compute_dtype,
                                 deterministic=False,
                                 tp=args.tp, pp=args.pp,
                                 pp_microbatches=args.pp_microbatches)
    merge = args.clip_weight_path or args.bert_weight_path
    try:
        # pretrained merge happens host-side anyway (np.asarray below) —
        # init on the host to avoid creating the tree device-side and
        # pulling it back (~700 MB for ViT-B over a tunneled TPU); the
        # mesh sharding commits it to devices right after build_model
        cpu = jax.local_devices(backend="cpu")[0] if merge else None
    except RuntimeError:
        cpu = None
    with jax.default_device(cpu):
        params, batch_stats = init_clip(jax.random.PRNGKey(args.seed), cfg)
    if merge:
        clip_sd = load_torch_state_dict(args.clip_weight_path) if args.clip_weight_path else None
        bert_sd = load_torch_state_dict(args.bert_weight_path) if args.bert_weight_path else None
        params = jax.tree.map(np.asarray, params)
        params, batch_stats = merge_pretrained(params, batch_stats, cfg, clip_sd, bert_sd)
        logging.info("loaded pretrained weights (clip=%s, bert=%s)",
                     args.clip_weight_path, args.bert_weight_path)
    return cfg, params, batch_stats, train_options


# The reference's 4 published ModelScope teachers (training/main.py:253-259).
# The two CN-CLIP-family ones ARE CN-CLIP architectures — their snapshots
# load through the same layout-auto-detecting .pt path as any checkpoint
# (pass the downloaded weight file via --teacher-weight-path). TEAM and
# RLEG are different architectures (TEAM's image_model / RLEG's
# encode_image are not CLIP towers) with no in-tree graph — refused with
# a pointer rather than silently mis-loaded.
MODELSCOPE_TEACHERS = {
    "damo/multi-modal_clip-vit-huge-patch14_zh":
        "ViT-H-14@RoBERTa-wwm-ext-large-chinese",
    "damo/multi-modal_clip-vit-large-patch14_zh":
        "ViT-L-14@RoBERTa-wwm-ext-base-chinese",
}
OUT_OF_FAMILY_TEACHERS = {
    "damo/multi-modal_team-vit-large-patch14_multi-modal-similarity",
    "damo/multi-modal_rleg-vit-large-patch14",
}


def resolve_teacher_config(name: str):
    """Registry struct for a teacher name: CN-CLIP struct names pass
    through; the reference's ModelScope teacher ids map to their CN-CLIP
    architecture; TEAM/RLEG raise (out-of-family, see MODELSCOPE_TEACHERS)."""
    if name in OUT_OF_FAMILY_TEACHERS:
        raise NotImplementedError(
            f"teacher {name!r} is not a CN-CLIP architecture (TEAM/RLEG "
            "remap a non-CLIP image encoder, reference training/"
            "main.py:253-259); only the CN-CLIP-family teachers are "
            "supported — use damo/multi-modal_clip-vit-{huge,large}-"
            "patch14_zh or any registry struct name")
    return load_config(MODELSCOPE_TEACHERS.get(name, name))


def build_teacher(args):
    if not args.distillation:
        return None
    assert args.teacher_model_name, "--distillation needs --teacher-model-name"
    t_cfg = resolve_teacher_config(args.teacher_model_name)
    t_params, t_stats = init_clip(jax.random.PRNGKey(0), t_cfg)
    if args.teacher_weight_path:
        sd = load_torch_state_dict(args.teacher_weight_path)
        loaded, loaded_stats = params_from_state_dict(sd, t_cfg)
        t_params.update(loaded)
        t_stats.update(loaded_stats)
    t_params = jax.tree.map(jnp.asarray, t_params)
    # BN running stats ride along for ResNet-tower teachers (eval mode).
    t_stats = jax.tree.map(jnp.asarray, t_stats)
    return (t_cfg, t_params, t_stats)


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        try:
            jax.config.update("jax_platforms", args.platform)
        except Exception as e:
            logging.warning("could not set platform %s: %s", args.platform, e)
    log_path = setup_logging(args.logs, args.name)

    # Multi-host: initialize jax.distributed BEFORE any device call so each
    # process sees the global topology (otherwise every host would silently
    # train an independent replica on identical data — process_index()==0
    # everywhere). Explicit env rendezvous (COORDINATOR_ADDRESS/
    # NUM_PROCESSES/PROCESS_ID, parallel/distributed.py) or --distributed
    # for TPU-pod metadata autodetect; single-host launches skip it (the
    # autodetect probe can block on non-pod platforms).
    if args.distributed or os.environ.get("COORDINATOR_ADDRESS") \
            or os.environ.get("NUM_PROCESSES"):
        from nans_clip_tpu.parallel.distributed import init_distributed
        init_distributed()
        logging.info("multi-host: process %d/%d", jax.process_index(),
                     jax.process_count())

    logging.info("devices: %s", jax.devices())

    mesh = create_mesh(model=args.tp, pipe=args.pp)
    data_size = mesh.shape["data"]
    logging.info("mesh: data=%d model=%d pipe=%d", data_size, args.tp, args.pp)
    if args.pp > 1:
        from nans_clip_tpu.parallel.pp import (bubble_fraction,
                                               pick_microbatches)
        local_b = max(1, args.batch_size // max(1, data_size))
        m = args.pp_microbatches or pick_microbatches(local_b, args.pp)
        logging.info(
            "pipeline: pp=%d microbatches=%d (%d samples each) "
            "GPipe bubble=%.1f%% — raise --pp-microbatches to shrink it "
            "if the per-microbatch kernels stay row-filled",
            args.pp, m, local_b // m,
            100 * bubble_fraction(local_b, args.pp, m))

    cfg, params, batch_stats, options = build_model(args)
    resolution = cfg.vision.image_resolution

    # hyperparam dump (reference main.py:179-185)
    params_file = os.path.join(args.logs, args.name,
                               f"params_{time.strftime('%Y%m%d%H%M%S')}.txt")
    with open(params_file, "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k}: {getattr(args, k)}\n")

    if args.mask_ratio > 0 and cfg.is_resnet:
        logging.info("Note: mask_ratio > 0 (FLIP) only functions for ViT towers.")

    # data ------------------------------------------------------------------
    assert args.train_data, "--train-data is required"
    proc_idx, proc_cnt = jax.process_index(), jax.process_count()
    global_micro = args.batch_size * data_size
    train_ds = PairDataset(args.train_data)
    train_loader = DataLoader(
        train_ds, batch_size=global_micro // proc_cnt, decode_size=resolution,
        context_length=args.context_length, shuffle=True, seed=args.seed,
        process_index=proc_idx, process_count=proc_cnt,
        num_threads=args.num_workers, exact_decode=args.exact_decode)
    val_loader = None
    if args.val_data:
        val_ds = PairDataset(args.val_data)
        val_loader = DataLoader(
            val_ds, batch_size=args.valid_batch_size * data_size // proc_cnt,
            decode_size=resolution, context_length=args.context_length,
            shuffle=True, seed=args.seed, process_index=proc_idx,
            process_count=proc_cnt, num_threads=args.valid_num_workers,
            exact_decode=args.exact_decode)

    num_batches = train_loader.num_batches
    steps_per_epoch = num_batches // args.accum_freq
    max_steps_explicit = args.max_steps is not None
    if max_steps_explicit:
        args.max_epochs = math.ceil(args.max_steps * args.accum_freq / num_batches)
    else:
        args.max_steps = steps_per_epoch * args.max_epochs
    logging.info("train: %d pairs, %d batches/epoch, %d steps total",
                 train_loader.num_samples, num_batches, args.max_steps)

    tcfg = TrainConfig(
        lr=args.lr, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
        wd=args.wd, warmup=args.warmup, max_steps=args.max_steps,
        mask_ratio=args.mask_ratio, accum_freq=args.accum_freq,
        freeze_vision=args.freeze_vision, label_smoothing=args.label_smoothing,
        distillation=args.distillation, kd_loss_weight=args.kd_loss_weight,
        grad_norm_clip=args.grad_norm_clip,
        skip_scheduler=args.skip_scheduler,
        adam_state_dtype=(None if args.adam_state_dtype in (None, "float32")
                          else args.adam_state_dtype))

    teacher = build_teacher(args)

    ckpt_dir = os.path.join(args.logs, args.name, "checkpoints")

    with jax.set_mesh(mesh):
        params = shard_params(params, mesh, fsdp=args.fsdp,
                              fsdp_min_size=args.fsdp_min_size)
        state = create_train_state(params, batch_stats, tcfg)
        # Optimizer init mostly inherits the param shardings (zeros_like),
        # but not everywhere (the compact-Adam state is built with fresh
        # zeros) — commit the whole state explicitly, and pin the train
        # step's OUTPUT to the same tree so FSDP storage stays sharded.
        state = shard_train_state(state, mesh, fsdp=args.fsdp,
                                  fsdp_min_size=args.fsdp_min_size)
        state_sh = train_state_shardings(state, mesh, fsdp=args.fsdp,
                                         fsdp_min_size=args.fsdp_min_size)

        # auto-resume (reference main.py:201-237)
        start_epoch, start_step, start_off = 0, 0, None
        resume_tag = None
        if args.resume:
            resume_tag = args.resume
        elif latest_exists(ckpt_dir):
            resume_tag = "epoch_latest"
        if resume_tag:
            state, meta = restore_checkpoint(ckpt_dir, resume_tag, state,
                                             reset_optimizer=args.reset_optimizer)
            if meta:
                # The reference restores epoch AND step only when the data
                # offset is kept (main.py:223-225): --reset-data-offset
                # restarts the data order and the step counter together
                # (else `step >= max_steps` fires immediately on a finished
                # run). The LR schedule count lives in the optimizer state;
                # pair with --reset-optimizer to re-warm it.
                if not args.reset_data_offset:
                    start_epoch = meta.get("epoch", 0)
                    start_step = meta.get("step", int(state.step))
                    start_off = meta.get("epoch_batch")
                    saved_samples = meta.get("epoch_samples")
                    if saved_samples is not None:
                        # elastic resume: the SAMPLE count into the epoch is
                        # topology-independent; convert it to optimizer
                        # steps at the NEW global batch (epoch_batch alone
                        # would skip K*new_gbs samples when only K*old_gbs
                        # were trained). Floor = retrain at most one new
                        # step's tail rather than skip data; exact when the
                        # topology is unchanged.
                        start_off = saved_samples // (global_micro
                                                      * args.accum_freq)
                    if not max_steps_explicit:
                        # Elastic resume: steps_per_epoch may have changed
                        # (different mesh topology / global batch), so the
                        # epoch-derived step budget must count completed
                        # history at ITS OWN rate: steps already taken +
                        # what remains of this epoch + full future epochs.
                        # (The cosine-LR horizon in tcfg keeps the value
                        # computed at startup — an inherent elastic-resume
                        # approximation, same as re-deriving a torch
                        # scheduler against a new world size.)
                        off = (start_off if start_off is not None else
                               max(0, start_step
                                   - start_epoch * steps_per_epoch))
                        # clamp: a mid-epoch offset saved under a LARGER
                        # steps_per_epoch can exceed the new one (the
                        # resumed epoch is then already complete) — never
                        # let the budget drop below the steps taken
                        args.max_steps = max(start_step, (
                            start_step - off
                            + max(0, args.max_epochs - start_epoch)
                            * steps_per_epoch))
                logging.info("resumed from %s (epoch %d, step %d)",
                             resume_tag, start_epoch, start_step)

        train_step = make_train_step(cfg, tcfg, options, teacher=teacher,
                                     state_shardings=state_sh)
        spc = max(1, args.steps_per_call)
        multi_step = (make_multi_train_step(train_step, spc)
                      if spc > 1 else None)
        eval_step = make_eval_step(cfg, options)
        rng = jax.random.PRNGKey(args.seed)

        def run_validation(state, epoch):
            if val_loader is None:
                return
            # Sample-weighted accumulation over GLOBAL batches: eval_step's
            # metrics are in-batch means over the full global batch under
            # jit (the reference all_reduce-SUMs counters and divides by the
            # dataset size, training/train.py:387-395 — same number here
            # because every batch is padded to the full global batch size,
            # and the weighting keeps it right even if that changes).
            tot = {"loss": 0.0, "i2t_acc": 0.0, "t2i_acc": 0.0}
            n = 0
            for batch in val_loader:
                im = global_batch_from_host_batch(batch.images, mesh)
                tx = global_batch_from_host_batch(batch.texts, mesh)
                im = preprocess_images(jax.random.PRNGKey(0), im, resolution, augment=False)
                m = eval_step(state.params, state.batch_stats, im, tx)
                gb = batch.images.shape[0] * jax.process_count()
                for k in tot:
                    tot[k] += float(m[k]) * gb
                n += gb
            assert n == val_loader.num_samples, (n, val_loader.num_samples)
            logging.info("VALID epoch %d | loss %.4f | i2t %.2f%% | t2i %.2f%% | %d samples",
                         epoch, tot["loss"] / n, 100 * tot["i2t_acc"] / n,
                         100 * tot["t2i_acc"] / n, n)

        # Preemption safety (beyond the reference): on SIGTERM/SIGINT finish
        # the current step, checkpoint, and exit cleanly so auto-resume
        # continues from the exact step after rescheduling.
        preempted = {"flag": False}

        def _handle(signum, frame):
            logging.warning("signal %s received - checkpointing and exiting", signum)
            preempted["flag"] = True

        signal.signal(signal.SIGTERM, _handle)
        signal.signal(signal.SIGINT, _handle)

        profile_range = None
        prof_active = {"flag": False}
        if args.profile_steps:
            lo, hi = args.profile_steps.split(":")
            profile_range = (int(lo), int(hi))
            profile_dir = os.path.join(args.logs, args.name, "profile")

        def stop_profiler():
            # flush the trace on ANY loop exit (max_steps break, preemption
            # return) so a window that straddles the end still writes a file
            if prof_active["flag"]:
                jax.profiler.stop_trace()
                prof_active["flag"] = False
                logging.info("profiler trace written to %s", profile_dir)

        step = start_step

        def crossed(interval, n):
            # did (step-n, step] cross a multiple of interval? At n=1 this
            # is exactly `step % interval == 0` — the K=1 cadence semantics
            return (interval and interval > 0
                    and (step // interval) > ((step - n) // interval))

        def run_group(groups, i, epoch, epoch_steps):
            """Dispatch ``len(groups)`` optimizer steps — ONE scanned call
            for a full steps-per-call group, singles for a tail (epoch end
            or max_steps trim; shape-stable, so the single-step executable
            is compiled once and reused) — plus all per-step bookkeeping
            at dispatch granularity. Returns (epoch_steps, stop_reason)."""
            nonlocal state, step, data_time, profile_range
            n = len(groups)
            t0 = time.time()
            if profile_range and not prof_active["flag"] \
                    and step <= profile_range[0] < step + n:
                jax.profiler.start_trace(profile_dir)
                prof_active["flag"] = True
            if n == spc and multi_step is not None:
                ims, txs, rngs = (jnp.stack(z) for z in zip(*groups))
                state, metrics = multi_step(state, ims, txs, rngs)
            else:
                for g in groups:
                    state, metrics = train_step(state, *g)
            step += n
            epoch_steps += n
            if profile_range and prof_active["flag"] \
                    and step >= profile_range[1]:
                stop_profiler()
                profile_range = None

            if crossed(args.log_interval, n):
                metrics = jax.tree.map(float, metrics)   # last step's
                batch_time = (time.time() - t0) / n      # per optimizer step
                logging.info(
                    "Epoch %d [%d/%d] | loss %.6f | i2t %.2f%% | t2i %.2f%% | "
                    "data %.3fs | batch %.3fs | logit_scale %.3f | gbs %d",
                    epoch, (i + 1), num_batches, metrics["loss"],
                    100 * metrics["i2t_acc"], 100 * metrics["t2i_acc"],
                    data_time, batch_time, metrics["logit_scale"],
                    global_micro * args.accum_freq)
            data_time = 0.0

            if crossed(args.valid_step_interval, n):
                run_validation(state, epoch)
            if crossed(args.save_step_frequency, n):
                meta = {"epoch": epoch, "step": step, "name": args.name,
                        "epoch_batch": epoch_steps,
                        "epoch_samples": epoch_steps * args.accum_freq
                        * global_micro}
                save_checkpoint(ckpt_dir, f"step_{step}", state, meta,
                                args.save_torch_format, cfg)
            if preempted["flag"]:
                stop_profiler()
                meta = {"epoch": epoch, "step": step, "name": args.name,
                        "epoch_batch": epoch_steps,
                        "epoch_samples": epoch_steps * args.accum_freq
                        * global_micro}
                save_checkpoint(ckpt_dir, f"preempt_step_{step}", state, meta,
                                args.save_torch_format, cfg)
                logging.info("preemption checkpoint saved at step %d", step)
                return epoch_steps, "preempt"
            if step >= args.max_steps:
                return epoch_steps, "max_steps"
            return epoch_steps, None

        for epoch in range(start_epoch, args.max_epochs):
            # Mid-epoch resume (step_N / preempt_step_N): fast-forward the
            # resumed epoch past the batches already trained, so no batch
            # is trained twice and the epoch's tail is not lost. (The
            # reference instead replays the whole epoch and re-derives the
            # step from the batch index, train.py:167; our shuffle order is
            # a pure function of seed+epoch, so skipping is exact.)
            if epoch == start_epoch and start_off is not None:
                # intra-epoch offset from the checkpoint meta, already
                # converted to optimizer steps at THIS run's global batch
                # (epoch_samples above) — valid across a mesh-topology /
                # global-batch change; bare epoch_batch (pre-epoch_samples
                # checkpoints) is only same-topology-exact
                resume_off = start_off
            elif epoch == start_epoch:
                # legacy checkpoints (no epoch_batch): derive from the
                # global step — only correct while steps_per_epoch is
                # unchanged over the run's whole history
                resume_off = step - epoch * steps_per_epoch
            else:
                resume_off = 0
            train_loader.set_epoch(
                epoch, start_batch=max(0, resume_off) * args.accum_freq)
            epoch_steps = max(0, resume_off)
            micro_buf = []
            group_buf = []   # steps-per-call > 1: device-ready step inputs
            stop = None
            t_data = time.time()
            data_time = 0.0
            for i, batch in enumerate(train_loader):
                data_time += time.time() - t_data
                micro_buf.append(batch)
                if len(micro_buf) < args.accum_freq:
                    t_data = time.time()
                    continue
                images = np.concatenate([b.images for b in micro_buf])
                texts = np.concatenate([b.texts for b in micro_buf])
                micro_buf = []

                im = global_batch_from_host_batch(images, mesh)
                tx = global_batch_from_host_batch(texts, mesh)
                rng, srng, arng = jax.random.split(rng, 3)
                im = preprocess_images(arng, im, resolution, augment=args.use_augment)
                group_buf.append((im, tx, srng))
                # collect a full steps-per-call group before dispatching —
                # trimmed when fewer steps remain in the budget (no
                # overshoot past max_steps)
                if len(group_buf) < min(spc, args.max_steps - step):
                    t_data = time.time()
                    continue
                groups, group_buf = group_buf, []
                epoch_steps, stop = run_group(groups, i, epoch, epoch_steps)
                if stop == "preempt":
                    return state
                if stop == "max_steps":
                    break
                t_data = time.time()
            if group_buf and stop is None:
                # epoch tail shorter than steps-per-call: flush as singles
                epoch_steps, stop = run_group(group_buf, num_batches - 1,
                                              epoch, epoch_steps)
                group_buf = []
                if stop == "preempt":
                    return state

            if (epoch + 1) % args.valid_epoch_interval == 0:
                run_validation(state, epoch)
            meta = {"epoch": epoch + 1, "step": step, "name": args.name,
                    "epoch_batch": 0, "epoch_samples": 0}
            tag = f"epoch{epoch + 1}" if (epoch + 1) % args.save_epoch_frequency == 0 \
                else "epoch_latest"
            save_checkpoint(ckpt_dir, tag, state, meta, args.save_torch_format, cfg)
            if step >= args.max_steps:
                break
        stop_profiler()

    logging.info("done: %d steps. log: %s", step, log_path)
    return state


if __name__ == "__main__":
    main()
