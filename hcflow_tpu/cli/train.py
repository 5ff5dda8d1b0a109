"""Training CLI: ``python -m hcflow_tpu.cli.train --opt <yml>``.

Behavioral reference: /root/reference/codes/train_HCFlow.py plus the trainer logic in
HCFlow_SR_model.py / HCFlow_Rescaling_model.py:

- ActNorm data-dependent re-initialization every step below ``act_norm_start_step``
  when training NLL-only (HCFlow_SR_model.py:186-187) — here an explicit calibration
  pass before the jitted step,
- G pass structure per iteration: NLL -> (pixel) -> (fea/GAN) -> D, gated by
  D_update_ratio / D_init_iters,
- checkpoints every save_checkpoint_freq with keep-2 + every-5000 retention and
  ``resume_state: auto``,
- validation every val_freq with the full eval metric grid.
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import create_dataloader, create_dataset
from ..data.loader import EnlargedSampler
from ..parallel import batch_sharding, init_distributed, is_main_process, make_mesh, replicated
from ..models.discriminators import VGGDiscriminatorSpec
from ..models.vgg import VGG19FeatureSpec, load_npz
from ..train import init_state, make_optimizer
from ..train.losses import pixel_criterion
from ..train.schedules import restart_steps, schedule_from_opt
from ..train.trainer import (
    make_d_optimizer,
    make_d_step,
    make_rescaling_step,
    make_sr_feagan_step,
    make_sr_nll_step,
    make_sr_pixel_step,
)
from ..utils import config as config_mod
from ..utils.checkpoint import (
    latest_checkpoint,
    load_any,
    load_checkpoint,
    prune_checkpoints,
    save_checkpoint,
    wait_for_saves,
)
from ..utils.logging import TBWriter, setup_logger
from .evaluate import Evaluator

opt_get = config_mod.opt_get


def build_loaders(opt, seed, num_replicas=1, rank=0):
    train_loader = val_loader = None
    for phase, dataset_opt in (opt.get("datasets") or {}).items():
        dataset_opt = dict(dataset_opt, seed=seed)
        if phase == "train":
            ds = create_dataset(dataset_opt)
            sampler = EnlargedSampler(
                len(ds), ratio=200, num_replicas=num_replicas, rank=rank, seed=seed
            )
            train_loader = create_dataloader(ds, dataset_opt, sampler=sampler)
        elif phase == "val":
            ds = create_dataset(dict(dataset_opt, phase="val"))
            val_loader = create_dataloader(ds, dict(dataset_opt, phase="val"))
    return train_loader, val_loader


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--opt", required=True)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--max_steps", type=int, default=None, help="override niter")
    args = parser.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    elif (jax.config.jax_platforms or "").strip().lower() != "cpu":
        # fail fast with a diagnosis instead of blocking forever on a wedged
        # tunnel / held chip claim (utils/backend_guard.py)
        from ..utils.backend_guard import backend_ready

        ok, reason = backend_ready(deadline_s=600.0)
        if not ok:
            print(f"TPU backend unavailable: {reason}\n"
                  "(re-run with --cpu to train on CPU)", file=sys.stderr)
            os._exit(3)

    opt = config_mod.parse(args.opt, is_train=True)
    train_opt = opt["train"]
    seed = train_opt.get("manual_seed", 0) or 0
    paths = opt["path"]
    for d in (paths["experiments_root"], paths["models"], paths["training_state"]):
        os.makedirs(d, exist_ok=True)
    # multi-host (DCN) init is a no-op single-host; the device mesh carries DP over ICI
    proc_rank, proc_count = init_distributed()
    mesh = make_mesh()
    data_sh = batch_sharding(mesh)
    repl_sh = replicated(mesh)
    logger = setup_logger("base", paths["log"], to_file=is_main_process())
    tb = TBWriter(
        os.path.join(paths["root"], "tb_logger", opt.get("name", "exp"))
        if opt.get("use_tb_logger")
        else None
    )
    logger.info(
        f"platform: {jax.devices()[0].platform}, devices: {len(jax.devices())}, "
        f"hosts: {proc_count}, mesh: {mesh.shape}"
    )

    # ------------------------------------------------------------------ model
    import dataclasses as _dc

    model_spec = config_mod.model_spec_from_opt(opt)
    if model_spec.flow.compute_dtype is not None:
        logger.warning(
            "training with compute_dtype=%s: bf16 gradients destabilize flow NLL "
            "training (diverges in practice) — use f32 for training and bf16 for "
            "serving unless you know what you are doing", model_spec.flow.compute_dtype,
        )
    # remat policy: trunks-only is the sweet spot (fits HBM at 160px/batch-16 for
    # both precisions and is ~2-5x faster than remat-everything); both overridable
    model_spec = _dc.replace(
        model_spec,
        flow=_dc.replace(
            model_spec.flow,
            remat_steps=bool(opt_get(opt, ["train", "remat_steps"], False)),
            remat_trunks=bool(opt_get(opt, ["train", "remat_trunks"], True)),
        ),
    )
    is_rescaling = "rescaling" in (opt.get("model") or "").lower()
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = model_spec.init(k_init)

    pretrain = opt_get(opt, ["path", "pretrain_model_G"])
    if pretrain and os.path.exists(pretrain):  # orbax checkpoints are directories
        logger.info(f"loading pretrained G from {pretrain}")
        loaded = load_any(
            pretrain, model_spec.flow,
            like={"params": params, "step": np.asarray(0)}
            if os.path.isdir(pretrain) else None,
        )
        params = loaded["params"] if isinstance(loaded, dict) and "params" in loaded else loaded

    # --------------------------------------------------------------- trainers
    niter = args.max_steps or int(train_opt.get("niter", 100000))
    schedule = schedule_from_opt(train_opt)
    clear_at = restart_steps(train_opt)  # clear_state: reset Adam moments at restarts
    tx = make_optimizer(train_opt, schedule)
    state = init_state(params, tx)

    nll_weight = train_opt.get("nll_weight", 1 if not is_rescaling else 0) or 0
    pixel_weight_hr = train_opt.get("pixel_weight_hr", 0) or 0
    fea_weight = train_opt.get("feature_weight", 0) or 0
    gan_weight = train_opt.get("gan_weight", 0) or 0
    eps_std_reverse = train_opt.get("eps_std_reverse", 0.9)
    d_update_ratio = train_opt.get("D_update_ratio", 1) or 1
    d_init_iters = train_opt.get("D_init_iters", 0) or 0
    act_norm_start = opt_get(opt, ["network_G", "act_norm_start_step"], 0) or 0

    d_spec = d_state = d_step = None
    f_params = f_apply = None
    if gan_weight:
        gt_size = opt_get(opt, ["datasets", "train", "GT_size"], 160)
        which_d = opt_get(opt, ["network_D", "which_model_D"], "") or ""
        if which_d == "PatchGANDiscriminator":
            # ref networks.py:52-53: in_nc/ndf/n_layers from network_D
            from ..models.discriminators import PatchGANDiscriminatorSpec

            d_spec = PatchGANDiscriminatorSpec(
                in_nc=opt_get(opt, ["network_D", "in_nc"], 3) or 3,
                ndf=opt_get(opt, ["network_D", "ndf"], 64) or 64,
                n_layers=opt_get(opt, ["network_D", "n_layers"], 5) or 5,
            )
        else:
            d_spec = VGGDiscriminatorSpec(input_size=gt_size)
        key, k_d = jax.random.split(key)
        d_tx = make_d_optimizer(train_opt, schedule_from_opt({**train_opt, "lr_G": train_opt.get("lr_D", 1e-4)}))
        d_state = init_state(d_spec.init(k_d), d_tx)
        d_step = make_d_step(d_spec.apply, d_tx, train_opt.get("gan_type", "gan"))
    if fea_weight:
        f_spec = VGG19FeatureSpec()
        vgg_path = opt_get(opt, ["path", "vgg19_npz"], "weights/vgg19_features.npz")
        f_params = load_npz(vgg_path)
        if f_params is None:
            fallback = opt_get(opt, ["train", "feature_fallback"], "off")
            if fallback == "random":
                from ..models.vgg import random_features

                logger.warning(
                    f"no pretrained VGG weights at {vgg_path}; using DETERMINISTIC "
                    "RANDOM He-init VGG features as the perceptual loss (opt-in "
                    "substitute via train.feature_fallback: random — see "
                    "models/vgg.py:random_features; NOT comparable to pretrained VGG)"
                )
                f_params = random_features(seed=0)
            else:
                logger.warning(
                    f"feature_weight={fea_weight} but no VGG weights at {vgg_path} "
                    "and feature_fallback=off; perceptual loss DISABLED"
                )
                fea_weight = 0
        if fea_weight:
            f_apply = f_spec.apply

    if is_rescaling:
        # optional fea/GAN heads ride the SAME single G backward and share the
        # joint pass's fake_H (ref:HCFlow_Rescaling_model.py:237-262) — unlike
        # the SR trainer's separate third pass
        rescaling_heads = bool((fea_weight and f_apply is not None)
                               or (gan_weight and d_spec is not None))
        joint_step = make_rescaling_step(
            model_spec,
            tx,
            train_opt.get("pixel_weight_lr", 5e-2),
            train_opt.get("weight_z", 1e-5),
            pixel_weight_hr or 1.0,
            eps_std_reverse=train_opt.get("eps_std_reverse", 1.0),
            lr_criterion=pixel_criterion(train_opt.get("pixel_criterion_lr", "l2")),
            hr_criterion=pixel_criterion(train_opt.get("pixel_criterion_hr", "l1")),
            gan_type=train_opt.get("gan_type", "gan"),
            gan_weight=gan_weight, fea_weight=fea_weight,
            fea_criterion=pixel_criterion(train_opt.get("feature_criterion", "l1")),
            d_apply=d_spec.apply if d_spec else None, f_apply=f_apply,
        )
        reverse_fn = jax.jit(lambda p, k, x, e: model_spec.reverse(p, k, x, e))
    else:
        nll_step = make_sr_nll_step(model_spec, tx, nll_weight)
        calibrate_fn = jax.jit(model_spec.calibrate)
        reverse_fn = jax.jit(lambda p, k, x, e: model_spec.reverse(p, k, x, e))
        pix_step = fg_step = None  # built after resume (warmup needs start_step)

    # ----------------------------------------------------------------- resume
    ckpt_backend = opt_get(opt, ["path", "checkpoint_backend"], "pickle")
    start_step = 0
    if opt_get(opt, ["path", "resume_state"]) == "auto":
        latest = latest_checkpoint(paths["training_state"], ".state")
        if latest:
            logger.info(f"auto-resuming from {latest}")
            state_like = {
                "step": np.asarray(0), "params": state.params,
                "opt_state": state.opt_state,
                "d_params": d_state.params if d_state else None,
                "d_opt_state": d_state.opt_state if d_state else None,
                "epoch": np.asarray(0),
            }
            saved = load_checkpoint(latest, like=state_like)
            state = state.replace(
                step=jnp.asarray(saved["step"]), params=saved["params"],
                opt_state=saved["opt_state"],
            )
            if d_state is not None and saved.get("d_params") is not None:
                d_state = d_state.replace(
                    params=saved["d_params"], opt_state=saved["d_opt_state"]
                )
            start_step = int(saved["step"])

    if not is_rescaling:
        # reverse-leg passes; built here so the pixel warmup ramp (a config-gated
        # stabilizer, off by default) can anchor at the resumed step
        pixel_warmup = int(train_opt.get("pixel_warmup_hr") or 0)
        rev_clip = train_opt.get("reverse_grad_clip")
        pix_step = (
            make_sr_pixel_step(
                model_spec, tx, pixel_weight_hr,
                pixel_criterion(train_opt.get("pixel_criterion_hr", "l1")),
                warmup_steps=pixel_warmup, warmup_start=start_step,
                reverse_grad_clip=rev_clip,
            )
            if pixel_weight_hr
            else None
        )
        fg_step = (
            make_sr_feagan_step(
                model_spec, tx, eps_std_reverse,
                gan_type=train_opt.get("gan_type", "gan"),
                gan_weight=gan_weight, fea_weight=fea_weight,
                fea_criterion=pixel_criterion(train_opt.get("feature_criterion", "l1")),
                d_apply=d_spec.apply if d_spec else None, f_apply=f_apply,
                reverse_grad_clip=rev_clip,
            )
            if (gan_weight or fea_weight)
            else None
        )

    # ------------------------------------------------------------------- data
    train_loader, val_loader = build_loaders(opt, seed, proc_count, proc_rank)
    assert train_loader is not None, "no train dataset configured"

    # replicate train state over the mesh; batches get sharded per step
    state = jax.device_put(state, repl_sh)
    if d_state is not None:
        d_state = jax.device_put(d_state, repl_sh)
    n_dev = mesh.devices.size
    _warned_ragged = {"flag": False}

    print_freq = opt_get(opt, ["logger", "print_freq"], 200)
    save_freq = int(opt_get(opt, ["logger", "save_checkpoint_freq"], 5000))
    val_freq = int(opt_get(opt, ["train", "val_freq"], 5000))
    heats = opt_get(opt, ["val", "heats"], [0.0])
    n_sample = opt_get(opt, ["val", "n_sample"], 1)

    # graceful preemption: on SIGTERM/SIGINT, finish the current step, save, exit
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        logger.warning(f"signal {signum} received - saving state and stopping")
        stop_requested["flag"] = True

    prev_handlers = (signal.getsignal(signal.SIGTERM), signal.getsignal(signal.SIGINT))
    signal.signal(signal.SIGTERM, _request_stop)
    signal.signal(signal.SIGINT, _request_stop)
    try:

        def save_all(tag_step):
            save_checkpoint(
                os.path.join(paths["models"], f"{tag_step}_G.ckpt"),
                {"params": state.params, "step": tag_step},
                backend=ckpt_backend,
            )
            save_checkpoint(
                os.path.join(paths["training_state"], f"{tag_step}.state"),
                {
                    "step": tag_step,
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "d_params": d_state.params if d_state else None,
                    "d_opt_state": d_state.opt_state if d_state else None,
                    "epoch": epoch,
                },
                backend=ckpt_backend,
            )
            # reference hardcodes keep-2 + every-5000 (base_model.py:82-94);
            # config override lets curve campaigns retain intermediate ckpts
            keep = int(opt_get(opt, ["logger", "checkpoint_keep"], 2) or 2)
            period = int(opt_get(opt, ["logger", "checkpoint_keep_period"], 5000) or 0)
            prune_checkpoints(paths["models"], "_G.ckpt", keep=keep, keep_period=period)
            prune_checkpoints(paths["training_state"], ".state", keep=keep, keep_period=period)

        def emergency_save(tag_step):
            """Best-effort save after a device failure: the device->host transfer
            itself may hang on a wedged backend, so run it in a daemon thread with
            a deadline; a timed-out or failed save is logged and skipped (periodic
            checkpoints bound the loss, and both write backends are atomic, so a
            partial save cannot corrupt auto-resume)."""
            if not is_main_process():
                return
            import threading

            done = threading.Event()

            def _try():
                try:
                    save_all(tag_step)
                except Exception as se:  # noqa: BLE001 — best-effort by design
                    logger.warning(f"emergency save failed: {type(se).__name__}: {se}")
                finally:
                    done.set()

            threading.Thread(target=_try, daemon=True).start()
            if done.wait(180.0):
                logger.info(f"emergency checkpoint written at step {tag_step}")
            else:
                logger.warning(
                    "emergency save timed out; relying on the last periodic checkpoint"
                )

        from ..utils.profiling import ThroughputMeter

        meter = ThroughputMeter(window=max(int(print_freq), 10))
        logger.info(f"training from step {start_step} to {niter}")
        step = start_step
        epoch = 0
        t_last = time.time()
        base_key = jax.random.PRNGKey(seed + 1)
        nll_only = not (pixel_weight_hr or gan_weight or fea_weight) and not is_rescaling

        while step < niter:
            train_loader.set_epoch(epoch)
            for batch in train_loader:
                if step >= niter:
                    break
                step += 1
                if step in clear_at:
                    # reference lr_scheduler.py:23-24 (clear_state): drop optimizer
                    # moments at a restart; params are kept.  The LR schedule is
                    # external (driven by TrainState.step, trainer.py
                    # _scale_by_iteration_schedule), so tx.init resets ONLY adam
                    # moments/bias-correction + finite counters — the schedule
                    # position survives, matching torch where the scheduler's
                    # last_epoch continues across optimizer.state clears.
                    logger.info(f"clear_state: resetting optimizer state at step {step}")
                    state = state.replace(opt_state=tx.init(state.params))
                hr, lr = batch["GT"], batch["LQ"]
                if hr.shape[0] % n_dev == 0:
                    hr = jax.device_put(hr, data_sh)
                    lr = jax.device_put(lr, data_sh)
                else:  # ragged tail batch: replicate (correct, just not sharded)
                    if n_dev > 1 and not _warned_ragged["flag"]:
                        _warned_ragged["flag"] = True
                        logger.warning(
                            f"batch size {hr.shape[0]} not divisible by {n_dev} "
                            "devices: this batch (and any like it) runs REPLICATED, "
                            "serializing the step — fix batch_size or device count"
                        )
                    hr, lr = jnp.asarray(hr), jnp.asarray(lr)
                k = jax.random.fold_in(base_key, step)
                metrics = {}

                try:
                    if is_rescaling:
                        # G gated by D_update_ratio/D_init_iters exactly like SR
                        # (ref:HCFlow_Rescaling_model.py:211); when G is skipped
                        # the D trains on a no-grad reverse from the true LR
                        # (ref:HCFlow_Rescaling_model.py:275-277)
                        g_turn = (
                            step % d_update_ratio == 0 and step > d_init_iters
                        ) or not gan_weight
                        fake_h = None
                        if g_turn:
                            if rescaling_heads:
                                state, fake_h, metrics = joint_step(
                                    state, k, hr, lr,
                                    d_state.params if d_state else None, f_params,
                                )
                            else:
                                state, metrics = joint_step(state, k, hr, lr)
                        if gan_weight:
                            if fake_h is None:
                                fake_h = reverse_fn(
                                    state.params, jax.random.fold_in(k, 2), lr,
                                    train_opt.get("eps_std_reverse", 1.0),
                                )
                            d_state, m = d_step(d_state, hr, fake_h)
                            metrics.update(m)
                    else:
                        # actnorm re-initialization window (NLL-only pretraining)
                        if step < act_norm_start and nll_only:
                            new_params = calibrate_fn(state.params, k, hr, lr)
                            state = state.replace(params=new_params)

                        g_turn = (step % d_update_ratio == 0 and step > d_init_iters) or not gan_weight
                        fake_h = None
                        if g_turn:
                            state, m = nll_step(state, jax.random.fold_in(k, 0), hr, lr)
                            metrics.update(m)
                            if pix_step is not None:
                                state, m = pix_step(state, jax.random.fold_in(k, 1), hr, lr)
                                metrics.update(m)
                            if fg_step is not None:
                                state, fake_h, m = fg_step(
                                    state, jax.random.fold_in(k, 2), hr, lr,
                                    d_state.params if d_state else None, f_params,
                                )
                                metrics.update(m)
                        if gan_weight:
                            if fake_h is None:
                                fake_h = reverse_fn(
                                    state.params, jax.random.fold_in(k, 2), lr, eps_std_reverse
                                )
                            d_state, m = d_step(d_state, hr, fake_h)
                            metrics.update(m)
                except Exception as e:  # noqa: BLE001 — infra failures only; others re-raise
                    from ..utils.backend_guard import is_device_failure

                    if not is_device_failure(e):
                        raise
                    # Mid-run tunnel/backend loss (NOTES.md axon gotchas): save what
                    # we can within a deadline and exit EX_TEMPFAIL so a supervisor
                    # can restart; resume_state auto picks up the newest checkpoint.
                    logger.error(
                        f"device backend failure at step {step} "
                        f"({type(e).__name__}: {str(e)[:300]}) - restart will "
                        "auto-resume from the newest checkpoint"
                    )
                    emergency_save(step - 1)
                    tb.close()
                    raise SystemExit(75)  # EX_TEMPFAIL: retryable infra failure

                meter.tick(n_items=hr.shape[0], n_pixels=hr.shape[0] * hr.shape[1] * hr.shape[2])
                if step % print_freq == 0:
                    dt = (time.time() - t_last) / print_freq
                    t_last = time.time()
                    lr_now = float(schedule(step))
                    msg = ", ".join(f"{k_}: {float(v):.4e}" for k_, v in metrics.items())
                    logger.info(
                        f"<epoch:{epoch:3d}, iter:{step:8,d}, lr:{lr_now:.3e}, "
                        f"{dt:.3f}s/it, {meter.items_per_sec:.1f} img/s, "
                        f"{meter.megapixels_per_sec:.2f} MP/s> {msg}"
                    )
                    for k_, v in metrics.items():
                        tb.add_scalar(k_, float(v), step)
                    tb.add_scalar("perf/img_per_sec", meter.items_per_sec, step)

                if stop_requested["flag"]:
                    if is_main_process():
                        save_all(step)
                    logger.info(f"stopped by signal at step {step}")
                    tb.close()
                    return state

                if step % save_freq == 0 and is_main_process():
                    logger.info(f"saving models and training states at step {step}")
                    save_all(step)

                if val_loader is not None and step % val_freq == 0:
                    evaluator = Evaluator(
                        model_spec, state.params, heats, n_sample=n_sample,
                        scale=opt.get("scale", 4), logger=logger, rescaling=is_rescaling,
                        save_dir=os.path.join(paths.get("val_images", paths["log"]),
                                              f"iter_{step}") if is_main_process() else None,
                    )
                    results = evaluator.run(val_loader, jax.random.fold_in(base_key, niter + step))
                    for k_, v in results.items():
                        if isinstance(v, float):
                            tb.add_scalar(f"val/{k_}", v, step)
            epoch += 1

        logger.info("saving the final model")
        save_checkpoint(
            os.path.join(paths["models"], "latest_G.ckpt"),
            {"params": state.params, "step": step},
            backend=ckpt_backend,
        )
        wait_for_saves()
        tb.close()
        logger.info("end of training")
        return state
    finally:
        # main() is also invoked in-process (tests, notebooks): leaving the
        # flag-setting handlers installed makes later forked children immune
        # to terminate() (SIGTERM just sets a dead flag) and can hang exit
        signal.signal(signal.SIGTERM, prev_handlers[0])
        signal.signal(signal.SIGINT, prev_handlers[1])


if __name__ == "__main__":
    main()
