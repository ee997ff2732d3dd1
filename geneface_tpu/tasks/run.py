"""Training entry point.

``python -m geneface_tpu.tasks.run --config egs/... --exp_name <dir>
[--hparams a.b=1,c=2] [--infer]``

Mirrors the reference CLI (``tasks/run.py:9-18``): resolve the task class
from the config key ``task_cls`` by reflection and start it.
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--exp_name", default="")
    ap.add_argument("--hparams", default="")
    ap.add_argument("--infer", action="store_true")
    ap.add_argument("--reset", action="store_true")
    args = ap.parse_args()

    from geneface_tpu import _enable_persistent_compile_cache
    from geneface_tpu.config import load_config
    from geneface_tpu.parallel import initialize_distributed
    from geneface_tpu.training.trainer import resolve_task

    _enable_persistent_compile_cache(_force=True)
    initialize_distributed()
    work_dir = (
        os.path.join("checkpoints", args.exp_name) if args.exp_name else None
    )
    cfg = load_config(
        args.config, overrides=args.hparams, work_dir=work_dir,
        use_saved=not args.reset,
    )
    cfg["exp_name"] = args.exp_name
    cfg["infer"] = args.infer
    task_cls = resolve_task(cfg["task_cls"])
    task_cls.start(cfg)


if __name__ == "__main__":
    main()
