"""Config loading + registry resolution (reference parity: utils/parser.py)."""

import json
import os

import pytest

from multi_degradation_image_enhancement_tpu.utils.config import (
    dict_to_nonedict,
    load_config,
)
from multi_degradation_image_enhancement_tpu.utils.registry import (
    define_dataset,
    define_network,
    init_obj,
    resolve,
)

CFG_DIR = os.path.join(
    os.path.dirname(__file__), "..", "multi_degradation_image_enhancement_tpu", "config"
)


def test_comment_stripping_and_phase(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{\n  "name": "x", // a comment\n  "task": "y"\n}\n')
    cfg = load_config(str(p), phase="test")
    assert cfg["name"] == "x"
    assert cfg["phase"] == "test"


def test_nonedict_missing_keys():
    cfg = dict_to_nonedict({"a": {"b": 1}, "l": [{"c": 2}]})
    assert cfg["missing"] is None
    assert cfg["a"]["also_missing"] is None
    assert cfg["l"][0]["c"] == 2


def test_all_shipped_configs_parse():
    # Task recipes only — the config dir also ships non-task data files
    # (classifier_thresholds.json router defaults, serving_tuning.json
    # measured-kernel-variant provenance).  Identify task recipes by
    # content (a "model" block) rather than a name blacklist so new data
    # files don't break the suite.
    names = [f for f in os.listdir(CFG_DIR) if f.endswith(".json")]
    task_names = []
    for name in names:
        cfg = load_config(os.path.join(CFG_DIR, name), phase="train")
        if cfg["model"] is None:
            continue
        task_names.append(name)
        assert cfg["model"]["networks"][0]["name"][1] == "CDAN"
        assert cfg["train"]["dataset"] is not None
    assert len(task_names) >= 22  # 11 tasks × (paired + synthetic)


def test_reference_module_aliases_resolve():
    # The PyTorch reference's dotted names must resolve to our classes.
    from multi_degradation_image_enhancement_tpu.data.dataset import PairedDataset
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN

    assert resolve("models.cdan", "CDAN") is CDAN
    assert resolve("data.dataset", "PairedDataset") is PairedDataset


def test_define_network_builds_cdan():
    net = define_network({"name": ["models.cdan", "CDAN"], "args": {}})
    assert type(net).__name__ == "CDAN"


def test_init_obj_unknown_raises_not_implemented():
    with pytest.raises(NotImplementedError):
        init_obj({"name": ["nope.nope", "Nope"], "args": {}})


def test_reference_config_loads_if_present():
    ref = "/root/reference/config/noise.json"
    if not os.path.isfile(ref):
        pytest.skip("reference not mounted")
    cfg = load_config(ref, phase="train")
    net = define_network(cfg["model"]["networks"][0])
    assert type(net).__name__ == "CDAN"
