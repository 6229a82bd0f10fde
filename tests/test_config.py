"""Config system: yaml surface parity with the reference's yacs setup
(deep_hrnet/lib/config/default.py:17-160)."""

import pytest

from udp_pose_tpu.config import default_config, load_config

REFERENCE_YAML = "/root/reference/deep_hrnet/experiments/coco/hrnet/w32_256x192_adam_lr1e-3_offset_ofm_psa_aid.yaml"


def test_defaults_match_reference_keys():
    cfg = default_config()
    assert cfg.MODEL.TARGET_TYPE == "gaussian"
    assert cfg.LOSS.KPD == 4.0
    assert cfg.TEST.OKS_THRE == 0.5
    assert cfg.TRAIN.LR_STEP == [90, 110]
    assert cfg.DATASET.ROT_FACTOR == 30


def test_reference_experiment_yaml_loads_unchanged():
    cfg = load_config(REFERENCE_YAML)
    assert cfg.MODEL.NAME == "pose_hrnet_psa"
    assert cfg.MODEL.TARGET_TYPE == "offset"
    assert cfg.MODEL.IMAGE_SIZE == [192, 256]
    assert cfg.DATASET.CUTOUT == [1.0, 0.2, 1]
    assert cfg.MODEL.EXTRA.STAGE4.NUM_MODULES == 3
    assert cfg.TEST.FLIP_TEST is True
    assert cfg.TRAIN.END_EPOCH == 400


def test_dotted_cli_overrides():
    cfg = default_config()
    cfg.merge_from_list(["TEST.FLIP_TEST", "True", "TRAIN.LR", "0.01",
                         "MODEL.IMAGE_SIZE", "[192, 256]"])
    assert cfg.TEST.FLIP_TEST is True
    assert cfg.TRAIN.LR == 0.01
    assert cfg.MODEL.IMAGE_SIZE == [192, 256]


def test_unknown_key_rejected_but_extra_open():
    cfg = default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_dict({"NOPE": 1})
    cfg.MODEL.EXTRA.merge_from_dict({"ANY_NEW_KEY": [1, 2]})
    assert cfg.MODEL.EXTRA.ANY_NEW_KEY == [1, 2]


def test_freeze_semantics():
    cfg = default_config().freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.LR = 5.0
    cfg.defrost()
    cfg.TRAIN.LR = 5.0
    assert cfg.TRAIN.LR == 5.0


def test_all_reference_experiment_yamls_parse():
    import glob
    import yaml as pyyaml
    yamls = glob.glob("/root/reference/deep_hrnet/experiments/**/*.yaml",
                      recursive=True)
    assert len(yamls) >= 25
    n_experiment = 0
    for y in yamls:
        with open(y) as f:
            raw = pyyaml.safe_load(f)
        if "MODEL" not in raw:
            continue  # corenet-style backbone config (MODEL.CONFIG target)
        cfg = load_config(y)
        assert cfg.MODEL.NAME
        n_experiment += 1
    assert n_experiment >= 22


def test_shipped_configs_load_and_build():
    """Every canonical yaml in configs/ loads and its model builds (shapes
    via eval_shape — no compilation)."""
    import glob
    import os

    import jax
    import jax.numpy as jnp

    from udp_pose_tpu.models import build_model

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    yamls = sorted(glob.glob(os.path.join(root, "**", "*.yaml"),
                             recursive=True))
    assert len(yamls) >= 10
    for y in yamls:
        cfg = load_config(y)
        model = build_model(cfg)
        w, h = cfg.MODEL.IMAGE_SIZE
        shapes = jax.eval_shape(
            lambda r, m=model, hh=h, ww=w: m.init(
                r, jnp.zeros((1, hh, ww, 3), jnp.float32), train=False),
            jax.random.PRNGKey(0))
        assert shapes["params"], y
