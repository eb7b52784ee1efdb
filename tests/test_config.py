"""Config parser tests, including parsing the reference's real .conf files."""

import glob
import os

import pytest

from texir_code_tpu.config import ConfigFactory, parse_string

REF_CONFIGS = sorted(glob.glob("/root/reference/configs/*.conf"))


def test_basic_block_and_scalars():
    conf = parse_string(
        """
        train {
            expname = default
            lr = 3e-2
            epochs = 40
            flag = True
            name = "quoted value"
            res = [256, 512]
            nested { a = 1 }
        }
        """
    )
    assert conf.get_string("train.expname") == "default"
    assert conf.get_float("train.lr") == pytest.approx(3e-2)
    assert conf.get_int("train.epochs") == 40
    assert conf.get_bool("train.flag") is True
    assert conf.get_string("train.name") == "quoted value"
    assert conf.get_list("train.res") == [256, 512]
    assert conf.get_config("train.nested").get_int("a") == 1


def test_defaults_and_missing():
    conf = parse_string("a { b = 1 }")
    assert conf.get_list("a.missing", default=[8, 16]) == [8, 16]
    with pytest.raises(KeyError):
        conf.get_int("a.missing")


def test_comments_and_inline_values():
    conf = parse_string(
        """
        # full-line comment
        a {
            b = 2   # trailing comment
            c = path/with/slashes.obj  // c++ style
        }
        """
    )
    assert conf.get_int("a.b") == 2
    assert conf.get_string("a.c") == "path/with/slashes.obj"


@pytest.mark.parametrize("path", REF_CONFIGS, ids=[os.path.basename(p) for p in REF_CONFIGS])
def test_reference_configs_parse(path):
    """Every reference config file must parse with the expected key knobs."""
    conf = ConfigFactory.parse_file(path)
    block = "train" if "train" in conf else "test"
    assert conf.get_config(block) is not None
    # every reference config names classes by dotted path
    assert "." in conf.get_string(f"{block}.dataset_class", default="x.y")


def test_reference_mat_config_knobs():
    conf = ConfigFactory.parse_file("/root/reference/configs/mat_hdrhouse.conf")
    assert conf.get_list("train.pano_img_res") == [256, 512]
    assert conf.get_list("train.sample_light") == [32, 16]
    assert conf.get_float("train.mat_learning_rate") == pytest.approx(3e-2)
    assert conf.get_int("train.mat_epoch") == 40
    assert conf.get_list("models.render.sample_type") == ["uniform", "importance"]
    assert conf.get_list("models.irrf_network.dims") == [512, 512, 512, 512]


def test_shipped_conf_set_resolves():
    """Every conf shipped in configs/ (incl. the reference-parity set,
    reference configs/*.conf) parses and its dataset/model/loss dotted
    paths resolve through the alias registry to real classes."""
    import glob
    import os

    from texir_code_tpu.registry import get_class

    paths = sorted(
        glob.glob("configs/*.conf") + glob.glob("configs/reference/*.conf")
    )
    assert len(paths) >= 17  # 3 synthetic + 14 reference-parity
    for path in paths:
        conf = ConfigFactory.parse_file(path)
        block = "train" if conf.get("train", default=None) else "test"
        for key in ["dataset_class", "model_class", "irf_loss_class"]:
            dotted = conf.get_string(f"{block}.{key}", default=None)
            assert dotted, f"{path}: missing {block}.{key}"
            cls = get_class(dotted)
            assert callable(cls), f"{path}: {dotted} -> {cls}"
