"""Visualization + multiprocess utilities (SURVEY §2.1 rows 8/11)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from geneface_tpu.utils.multiprocess import MultiprocessManager, multiprocess_run  # noqa: E402
from geneface_tpu.utils.visualization import (  # noqa: E402
    draw_landmark_frame,
    plot_tsne,
    tsne,
)


def _square(x):
    return x * x


def test_multiprocess_run_ordered():
    results = list(multiprocess_run(_square, range(20), num_workers=4))
    assert [i for i, _ in results] == list(range(20))
    assert [r for _, r in results] == [i * i for i in range(20)]


def _add(a, b):
    return a + b


def test_multiprocess_manager_tuple_args_threads():
    mgr = MultiprocessManager(num_workers=2, multithread=True)
    for i in range(5):
        mgr.add_job(_add, (i, 10))
    got = dict(mgr.get_results())
    assert got == {i: i + 10 for i in range(5)}


def test_draw_landmark_frame():
    lm = np.random.RandomState(0).uniform(100, 400, (68, 2))
    img = draw_landmark_frame(lm, wh=512)
    assert img.shape == (512, 512, 3) and img.dtype == np.uint8
    # drawn pixels exist (not all white)
    assert (img != 255).any()


def test_render_lm3d_video(tmp_path):
    from geneface_tpu.utils.visualization import render_lm3d_to_video

    lm3d = np.random.RandomState(0).uniform(-0.8, 0.8, (4, 68, 3)).astype(np.float32)
    out = str(tmp_path / "lm.mp4")
    try:
        render_lm3d_to_video(lm3d, out, wh=128)
    except (FileNotFoundError, RuntimeError):  # no ffmpeg in env
        return
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_tsne_separates_clusters():
    rng = np.random.RandomState(0)
    a = rng.normal(0, 0.05, (40, 8))
    b = rng.normal(3, 0.05, (40, 8))
    x = np.concatenate([a, b])
    emb = tsne(x, perplexity=10, n_iter=260, seed=0)
    assert emb.shape == (80, 2)
    da = emb[:40].mean(0)
    db = emb[40:].mean(0)
    intra = max(emb[:40].std(), emb[40:].std())
    assert np.linalg.norm(da - db) > 2 * intra


def test_plot_tsne_png(tmp_path):
    x = np.random.RandomState(1).normal(size=(30, 5))
    out = str(tmp_path / "t.png")
    emb = plot_tsne(x, labels=np.arange(30) % 3, out_png=out, perplexity=5,
                    n_iter=60)
    assert emb.shape == (30, 2)
    assert os.path.exists(out)
