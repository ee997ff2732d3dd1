"""The egs/ config corpus loads, inherits, and names importable tasks.

Mirrors the reference's egs tree (`/root/reference/egs`): every per-dataset
YAML must resolve through its ``base_config`` chain and point at a real task
class, so `python -m geneface_tpu.tasks.run --config=<yaml>` can start it.
"""

import glob
import importlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pytest  # noqa: E402

from geneface_tpu.config import load_config  # noqa: E402

REPO = os.path.join(os.path.dirname(__file__), "..")
ALL_YAMLS = sorted(
    glob.glob(os.path.join(REPO, "egs", "datasets", "**", "*.yaml"), recursive=True)
)


def test_corpus_is_nonempty():
    assert len(ALL_YAMLS) >= 60  # 6 video ids + lrs3


@pytest.mark.parametrize("path", ALL_YAMLS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_resolves(path):
    cfg = load_config(path)
    if os.path.basename(path) == "base.yaml":
        return  # per-video shared fragment, not a runnable experiment
    task_cls = cfg.get("task_cls", "")
    assert task_cls, f"{path} resolves to no task_cls"
    module, cls = task_cls.rsplit(".", 1)
    mod = importlib.import_module(module)
    assert hasattr(mod, cls), f"{task_cls} not found"
    # every video experiment must carry its video_id through the chain
    if "/videos/" in path.replace(os.sep, "/"):
        assert cfg.get("video_id"), f"{path} lost its video_id"
