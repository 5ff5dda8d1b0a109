"""CLI-level tests: checkpoint conversion round trip and the serving Predictor."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/codes"


def _setup_ref():
    if "natsort" not in sys.modules:
        m = types.ModuleType("natsort")
        m.natsorted = sorted
        sys.modules["natsort"] = m
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    if REF not in sys.path:
        sys.path.insert(0, REF)


TINY_FD = {
    "K": 3, "L": 2, "flow_permutation": "invconv", "flow_coupling": "Affine",
    "nn_module": "FCN", "hidden_channels": 8, "cond_channels": None,
    "splitOff": {
        "enable": True, "after_flowstep": [1, 1], "flow_permutation": "invconv",
        "flow_coupling": "Affine", "nn_module": "FCN", "hidden_channels": 8,
        "RRDB_nb": [1, 1], "RRDB_nf": 8, "RRDB_gc": 4,
    },
}


def test_convert_cli_roundtrip(tmp_path):
    """torch .pth --(cli convert)--> .ckpt --> load_any --> same outputs."""
    _setup_ref()
    import jax
    import jax.numpy as jnp
    import yaml
    from models.modules.HCFlowNet_SR_arch import HCFlowNet_SR

    from hcflow_tpu.cli.convert import main as convert_main
    from hcflow_tpu.utils import config as config_mod
    from hcflow_tpu.utils.checkpoint import load_any

    opt = {"quant": 64, "scale": 4, "datasets": {"train": {"GT_size": 16}},
           "network_G": {"in_nc": 3, "flowDownsampler": TINY_FD}}
    net = HCFlowNet_SR(opt)
    g = torch.Generator().manual_seed(0)
    for name, p in net.named_parameters():
        if "permute.weight" in name:
            p.data = torch.linalg.qr(torch.randn(p.shape, generator=g))[0]
        else:
            p.data = torch.randn(p.shape, generator=g) * 0.03
    pth = str(tmp_path / "model.pth")
    torch.save(net.state_dict(), pth)

    yml = str(tmp_path / "opt.yml")
    yaml.safe_dump(
        {"name": "t", "model": "HCFlow_SR", "scale": 4, "quant": 64,
         "network_G": {"in_nc": 3, "flowDownsampler": TINY_FD}},
        open(yml, "w"),
    )
    out = str(tmp_path / "model.ckpt")
    convert_main(["model", "--pth", pth, "--opt", yml, "--out", out])
    assert os.path.isfile(out)

    spec = config_mod.model_spec_from_opt(config_mod.parse(yml, is_train=False))
    loaded = load_any(out)
    params_ckpt = loaded["params"]
    params_direct = load_any(pth, spec.flow)  # direct .pth conversion path

    lr = jax.random.uniform(jax.random.PRNGKey(1), (1, 4, 4, 3))
    a = spec.reverse(params_ckpt, jax.random.PRNGKey(0), lr, 0.0)
    b = spec.reverse(params_direct, jax.random.PRNGKey(0), lr, 0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predictor_padding_and_output(tmp_path):
    """Predictor handles odd-sized inputs (reflect pad to factor 2, crop SR back)."""
    import yaml

    from hcflow_tpu.cli.predict import Predictor
    from hcflow_tpu.data.util import save_img

    yml = str(tmp_path / "opt.yml")
    yaml.safe_dump(
        {"name": "t", "model": "HCFlow_SR", "scale": 4, "quant": 64,
         "network_G": {"in_nc": 3, "flowDownsampler": TINY_FD},
         "val": {"heats": [0.0], "n_sample": 1}},
        open(yml, "w"),
    )
    img = np.random.default_rng(0).random((11, 13, 3)).astype(np.float32)
    src = str(tmp_path / "in.png")
    save_img(src, img)
    pred = Predictor("general", opt_path=yml)
    out = pred.predict(src, out_path=str(tmp_path / "out.png"), heat=0.0)
    import cv2

    sr = cv2.imread(out)
    assert sr.shape == (44, 52, 3)


def test_evaluator_metric_grid():
    """Evaluator produces the full metric grid on a real bundled image."""
    import jax

    from hcflow_tpu.cli.evaluate import Evaluator
    from hcflow_tpu.data import DataLoader, create_dataset
    from hcflow_tpu.models import HCFlowSRSpec

    model = HCFlowSRSpec.for_scale(
        4, K=(2, 2), after_splitoff=(1, 1), rrdb_nb=(1, 1), rrdb_nf=8, rrdb_gc=4,
        hidden_channels=8, so_hidden_channels=8,
    )
    params = model.init(jax.random.PRNGKey(0))
    ds = create_dataset({
        "mode": "GT", "phase": "val", "scale": 4, "n_max": 1,
        "dataroot_GT": "/root/reference/datasets/example_face_8X/HR",
    })
    lines = []

    class _Log:
        def info(self, msg):
            lines.append(msg)

    ev = Evaluator(model, params, heats=[0.0, 0.8], n_sample=2, scale=4,
                   lpips_fn=lambda a, b: float(np.abs(a - b).mean()),
                   lpips_label="lpips_rand", logger=_Log())
    out = ev.run(DataLoader(ds, batch_size=1), jax.random.PRNGKey(1))
    for key in ("nll", "lr_psnr", "psnr@0.0", "ssim@0.8", "bic_psnr@0.0",
                "diversity@0.8", "psnr_y@0.0", "lpips_rand@0.0"):
        assert key in out, out.keys()
    # the summary line must carry the lpips column (reference test_HCFlow.py:132)
    avg = [ln for ln in lines if ln.startswith("---- average")]
    assert avg and all("lpips_rand:" in ln for ln in avg), avg
    assert out["diversity@0.0"] < 1e-6  # deterministic at heat 0
    assert out["diversity@0.8"] > 0.01
    assert out["n_images"] == 1


def test_predictor_loads_orbax_directory_checkpoint(tmp_path):
    """Serving must accept orbax *directory* checkpoints produced by cli/train.py
    with ``checkpoint_backend: orbax`` (regression: os.path.isfile rejected dirs
    and silently fell back to random init)."""
    import jax
    import yaml

    from hcflow_tpu.cli.predict import Predictor
    from hcflow_tpu.data.util import save_img
    from hcflow_tpu.utils import config as config_mod
    from hcflow_tpu.utils.checkpoint import save_checkpoint, wait_for_saves

    yml = str(tmp_path / "opt.yml")
    yaml.safe_dump(
        {"name": "t", "model": "HCFlow_SR", "scale": 4, "quant": 64,
         "network_G": {"in_nc": 3, "flowDownsampler": TINY_FD},
         "val": {"heats": [0.0], "n_sample": 1}},
        open(yml, "w"),
    )
    spec = config_mod.model_spec_from_opt(config_mod.parse(yml, is_train=False))
    params = spec.init(jax.random.PRNGKey(42))  # NOT the Predictor's seed-0 init
    ckpt = str(tmp_path / "100_G.ckpt")
    save_checkpoint(ckpt, {"params": params, "step": 100}, backend="orbax")
    wait_for_saves()
    assert os.path.isdir(ckpt)

    img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    src = str(tmp_path / "in.png")
    save_img(src, img)
    pred = Predictor("general", opt_path=yml, checkpoint=ckpt)
    out = pred.predict(src, out_path=str(tmp_path / "out.png"), heat=0.0)

    # the checkpoint's params (seed 42) must actually be serving — compare against
    # a direct reverse pass with those params
    lr = np.asarray(
        __import__("cv2").imread(src, __import__("cv2").IMREAD_COLOR)[:, :, ::-1],
        dtype=np.float32) / 255.0
    want = np.asarray(spec.reverse(
        spec.flow.precompute_inference(params, fused=False),
        jax.random.PRNGKey(0), lr[None], 0.0)[0])
    import cv2

    got = cv2.imread(out)[:, :, ::-1].astype(np.float32) / 255.0
    np.testing.assert_allclose(got, np.clip(want, 0, 1), atol=1.5 / 255)


def test_predict_cli_fused_flag_mapping():
    """--fused {all,chains,off} maps to precompute_inference's fused values;
    default resolves by backend (cli/predict.py:main)."""
    import hcflow_tpu.cli.predict as predict_mod

    captured = {}

    class FakePred:
        def __init__(self, model_type, opt, checkpoint, fused=None):
            captured["fused"] = fused

        def predict(self, image, out, heat, seed):
            return "out.png"

    orig = predict_mod.Predictor
    predict_mod.Predictor = FakePred
    try:
        for flag, expect in (("all", "all"), ("chains", True), ("off", False)):
            predict_mod.main(["--image", "x.png", "--fused", flag])
            assert captured["fused"] == expect, (flag, captured)
        predict_mod.main(["--image", "x.png"])
        assert captured["fused"] is None  # backend-resolved in Predictor
    finally:
        predict_mod.Predictor = orig


def test_test_cli_loads_orbax_directory_checkpoint(tmp_path):
    """cli/test.py must accept orbax *directory* checkpoints (same regression class
    as the Predictor: os.path.isfile rejected dirs -> silent random init)."""
    import jax
    import yaml

    import hcflow_tpu.cli.test as test_cli
    from hcflow_tpu.data.util import save_img
    from hcflow_tpu.utils import config as config_mod
    from hcflow_tpu.utils.checkpoint import save_checkpoint, wait_for_saves

    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    save_img(str(gt_dir / "a.png"),
             np.random.default_rng(0).random((16, 16, 3)).astype(np.float32))

    yml = str(tmp_path / "opt.yml")
    yaml.safe_dump(
        {"name": "t", "model": "HCFlow_SR", "scale": 4, "quant": 64,
         "path": {"root": str(tmp_path)},
         "datasets": {"test": {"name": "one", "mode": "GT",
                               "dataroot_GT": str(gt_dir)}},
         "network_G": {"in_nc": 3, "flowDownsampler": TINY_FD},
         "val": {"heats": [0.0], "n_sample": 1}},
        open(yml, "w"),
    )
    spec = config_mod.model_spec_from_opt(config_mod.parse(yml, is_train=False))
    params = spec.init(jax.random.PRNGKey(42))
    ckpt = str(tmp_path / "100_G.ckpt")
    save_checkpoint(ckpt, {"params": params, "step": 100}, backend="orbax")
    wait_for_saves()
    assert os.path.isdir(ckpt)
    with open(yml) as f:
        opt_d = yaml.safe_load(f)
    opt_d["path"]["pretrain_model_G"] = ckpt
    yaml.safe_dump(opt_d, open(yml, "w"))

    loaded = {}
    orig_load = test_cli.load_any

    def spy(path, *a, **k):
        loaded["path"] = path
        return orig_load(path, *a, **k)

    test_cli.load_any = spy
    try:
        test_cli.main(["--opt", yml])
    finally:
        test_cli.load_any = orig_load
    # the orbax DIRECTORY checkpoint must have gone through load_any (no silent
    # random-init fallback)
    assert loaded.get("path") == ckpt, loaded


@pytest.mark.slow
def test_rescaling_train_eval_e2e(tmp_path):
    """Full rescaling pipeline through the CLIs at tiny scale: the joint
    fwd+inv STE train step (cli/train.py is_rescaling branch), checkpointing,
    then the rescaling eval protocol (ref HCFlow_Rescaling_model.py:306-324 —
    model-downscale HR, quantize the generated LR, reconstruct HR from it) via
    cli/test.py. De-risks the on-chip campaign: every stage of
    configs/train_rescaling_x4_onchip.yml runs here at toy scale."""
    import yaml

    import hcflow_tpu.cli.test as test_cli
    from hcflow_tpu.cli import train as train_cli

    resc_fd = {
        "K": 2, "L": 2, "squeeze": "haar", "flow_permutation": "none",
        "flow_coupling": "Affine3shift", "nn_module": "DenseBlock",
        "hidden_channels": 8, "cond_channels": None,
        "splitOff": {
            "enable": True, "after_flowstep": [1, 1],
            "flow_permutation": "invconv", "flow_coupling": "Affine",
            "nn_module": "FCN", "nn_module_last": "Conv2dZeros",
            "hidden_channels": 8, "RRDB_nb": [1, 1], "RRDB_nf": 8, "RRDB_gc": 4,
        },
    }
    gt_root = "/root/reference/datasets/example_face_8X/HR"
    train_opt = {
        "name": "resc_smoke", "model": "HCFlow_Rescaling", "distortion": "sr",
        "scale": 4, "use_tb_logger": False,
        "datasets": {
            "train": {"name": "f", "mode": "GT", "dataroot_GT": gt_root,
                      "use_shuffle": True, "n_workers": 0, "batch_size": 2,
                      "GT_size": 32, "use_flip": True, "color": "RGB"},
        },
        "network_G": {"which_model_G": "HCFlowNet_SR", "in_nc": 3, "out_nc": 3,
                      "act_norm_start_step": 1, "flowDownsampler": resc_fd},
        "path": {"root": str(tmp_path), "pretrain_model_G": None,
                 "strict_load": True, "resume_state": None},
        "logger": {"print_freq": 2, "save_checkpoint_freq": 4},
        "train": {"lr_G": 2.5e-4, "lr_scheme": "MultiStepLR", "niter": 4,
                  "max_grad_clip": 5, "max_grad_norm": 100, "beta1": 0.9,
                  "beta2": 0.99, "warmup_iter": -1, "manual_seed": 0,
                  "val_freq": 100, "weight_z": 1e-5,
                  "pixel_criterion_lr": "l2", "pixel_weight_lr": 5e-2,
                  "eps_std_reverse": 1.0, "pixel_criterion_hr": "l1",
                  "pixel_weight_hr": 1.0, "feature_weight": 0, "gan_weight": 0},
        "val": {"heats": [1.0], "n_sample": 1},
    }
    cfg = tmp_path / "train.yml"
    cfg.write_text(yaml.safe_dump(train_opt))
    import signal

    prev_handlers = (signal.getsignal(signal.SIGTERM), signal.getsignal(signal.SIGINT))
    state = train_cli.main(["--opt", str(cfg), "--cpu"])
    # in-process main() must restore the preemption handlers it installed —
    # leaving them poisons pool workers forked by later code in this process
    assert signal.getsignal(signal.SIGTERM) is prev_handlers[0]
    assert signal.getsignal(signal.SIGINT) is prev_handlers[1]
    assert int(state.step) == 4
    ckpt = os.path.join(str(tmp_path), "experiments", "resc_smoke", "models", "4_G.ckpt")
    assert os.path.exists(ckpt), ckpt

    test_opt = {
        "name": "resc_smoke_eval", "model": "HCFlow_Rescaling", "scale": 4,
        "suffix": None,
        "datasets": {"test_1": {"name": "f", "mode": "GT", "n_max": 1,
                                "dataroot_GT": gt_root}},
        "network_G": {"which_model_G": "HCFlowNet_Rescaling", "in_nc": 3,
                      "out_nc": 3, "act_norm_start_step": 1,
                      "flowDownsampler": resc_fd},
        "path": {"root": str(tmp_path), "pretrain_model_G": ckpt,
                 "strict_load": True},
        "val": {"heats": [1.0], "n_sample": 1},
    }
    tcfg = tmp_path / "test.yml"
    tcfg.write_text(yaml.safe_dump(test_opt))
    results = test_cli.main(["--opt", str(tcfg), "--cpu"])
    summary = results["f"]
    # the rescaling protocol's two capability numbers must be present + finite:
    # generated-LR fidelity and HR reconstruction from the quantized fake LR
    assert np.isfinite(summary["lr_psnr"]), summary
    assert np.isfinite(summary["psnr@1.0"]), summary


def test_tb_writer_writes_event_file(tmp_path):
    """TBWriter produces a TensorBoard event file when torch.utils.tensorboard
    is available (reference: SummaryWriter in tb_logger/<name>,
    train_HCFlow.py:96-105) and degrades to a no-op otherwise."""
    from hcflow_tpu.utils.logging import TBWriter

    w = TBWriter(str(tmp_path / "tb"))
    w.add_scalar("train/nll", 1.5, 10)
    w.add_scalar("val/psnr", 27.4, 10)
    w.close()
    if w._w is not None:  # backend present: an events file must exist
        files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
        assert files, list((tmp_path / "tb").iterdir())
        assert files[0].stat().st_size > 0
    # None log_dir is always a silent no-op
    w2 = TBWriter(None)
    w2.add_scalar("x", 1.0, 0)
    w2.close()
