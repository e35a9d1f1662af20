"""Config system: reference key-tree, YAML merge, CLI override semantics."""
import pytest

from curriculum_learning_for_vln_tpu.utils.config import get_cfg_defaults


def test_default_tree_matches_reference_schema():
    cfg = get_cfg_defaults()
    # exact key spine of the reference yacs tree (ref: src/utils/config.py)
    assert cfg.DATA.MAX_ENC_LEN == 20
    assert cfg.TRAIN.SELF_PACE.CRATE == 1.0
    assert cfg.TRAIN.AUTO_CULM.RRSIZE == 0
    assert cfg.MODEL.ENVDROP.RL_NORMALIZE == "none"
    assert cfg.AIDE.SPEAKER.MAX_DECODE == 120
    assert cfg.MODEL.MONITOR.MLP_HIDDEN == (128,)


def test_merge_from_reference_yaml(tmp_path):
    yaml_text = """
TRAIN:
  OPTIM: "rms"
  LR: 0.0001
  BATCH_SIZE: 64
  MAX_EPOCH: 200
MODEL:
  NAME: "SELF-MONITOR"
  MONITOR:
    HIDDEN_SIZE: 512
    MLP_HIDDEN: (1024, )
AGENT:
  MAX_EPISODE_LEN: 35
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cfg = get_cfg_defaults()
    cfg.merge_from_file(str(p))
    assert cfg.TRAIN.OPTIM == "rms"
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.MODEL.MONITOR.MLP_HIDDEN == (1024,)  # yacs literal-eval parity
    assert cfg.AGENT.MAX_EPISODE_LEN == 35


def test_merge_from_list_and_type_coercion():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["TRAIN.LR", "0.01", "MODEL.NAME", "ENVDROP", "TRAIN.EVAL_TRAIN", "True"])
    assert cfg.TRAIN.LR == 0.01
    assert cfg.MODEL.NAME == "ENVDROP"
    assert cfg.TRAIN.EVAL_TRAIN is True


def test_unknown_key_rejected():
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["TRAIN.NOPE", "1"])


def test_freeze_and_clone():
    cfg = get_cfg_defaults()
    clone = cfg.clone()
    clone.TRAIN.LR = 5.0
    assert cfg.TRAIN.LR != 5.0
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.LR = 1.0
