"""Multi-process (multi-host analog) path: ``jax.distributed.initialize`` +
the ``put_sharded`` ``make_array_from_callback`` branch + ``host_local_slice``.

The reference's DDP spawns one process per GPU (``utils/commons/trainer.py``
``mp.spawn``); the TPU-pod analog is one process per host with
``jax.distributed``. This test launches 2 CPU processes (4 virtual devices
each → an 8-device global mesh) against a local coordinator and proves:

- the global mesh assembles across processes,
- ``shard_batch``/``put_sharded`` build a global array from per-host shards
  (the ``mesh.py`` multi-process branch, with the identical-global-batch
  checksum assertion enabled),
- a jitted global reduction over the sharded batch returns the exact
  host-computed global value on every process (XLA inserted the cross-process
  collective),
- ``host_local_slice`` tiles the dataset without overlap.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address=os.environ["GF_COORD"],
    num_processes=2,
    process_id=pid,
)
sys.path.insert(0, os.environ["GF_REPO"])
from geneface_tpu.parallel import make_mesh, shard_batch, host_local_slice
from geneface_tpu.parallel.mesh import DATA_AXIS

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

mesh = make_mesh()
assert mesh.shape[DATA_AXIS] == 8

# identical global batch on every host (the put_sharded invariant)
rng = np.random.RandomState(1234)  # host-independent seed
batch = {"rays": rng.randn(64, 3).astype(np.float32),
         "pose": rng.randn(4, 4).astype(np.float32)}
dev = shard_batch(mesh, batch)
assert dev["rays"].shape == (64, 3)
assert not dev["rays"].is_fully_replicated
assert dev["pose"].is_fully_replicated
assert len(dev["rays"].addressable_shards) == 4  # local shards only

@jax.jit
def global_stats(b):
    return b["rays"].sum(), (b["rays"] ** 2).mean()

s, m2 = global_stats(dev)
np.testing.assert_allclose(float(s), batch["rays"].sum(), rtol=1e-5)
np.testing.assert_allclose(float(m2), (batch["rays"] ** 2).mean(), rtol=1e-5)

sl = host_local_slice(64)
expected = slice(pid * 32, (pid + 1) * 32)
assert sl == expected, (sl, expected)
print(f"proc {pid} OK", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("GF_SKIP_MULTIPROC") == "1", reason="explicitly disabled"
)
def test_two_process_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ,
        GF_COORD=f"localhost:{port}",
        GF_REPO=os.path.join(os.path.dirname(__file__), ".."),
        GF_CHECK_GLOBAL_BATCH="1",
        JAX_PLATFORMS="cpu",
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert f"proc {i} OK" in out


_TRAIN_WORKER = r"""
import os, sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
single = os.environ.get("GF_SINGLE") == "1"
jax.config.update("jax_num_cpu_devices", 8 if single else 4)
if not single:
    pid = int(sys.argv[1])
    jax.distributed.initialize(
        coordinator_address=os.environ["GF_COORD"],
        num_processes=2,
        process_id=pid,
    )
else:
    pid = 0
sys.path.insert(0, os.environ["GF_REPO"])
import __graft_entry__
from geneface_tpu.parallel import make_mesh
from geneface_tpu.tasks.radnerf import RADNeRFTask

assert jax.device_count() == 8, jax.device_count()

cfg = __graft_entry__._tiny_cfg(
    os.environ["GF_DATA"],
    os.path.join(os.environ["GF_DATA"], f"work_mp_{'s' if single else pid}"),
    n_rays=512,
)
task = RADNeRFTask(cfg)
task.mesh = make_mesh()
state = task.build()
state = task.place_state(state)
gen = task.train_batches(0)
rng = jax.random.PRNGKey(0)
for step in range(2):
    rng, k = jax.random.split(rng)
    state, losses = task.train_step(state, next(gen), k)
jax.block_until_ready(losses["total_loss"])
loss = float(losses["total_loss"])
# params are replicated -> every process can reduce them fully
leaves = jax.tree_util.tree_leaves(state["params"])
checksum = float(sum(float(jax.numpy.sum(jax.numpy.abs(l))) for l in leaves))
print(f"TRAINRESULT {loss:.8f} {checksum:.5f}", flush=True)
print(f"proc {pid} OK", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("GF_SKIP_MULTIPROC") == "1", reason="explicitly disabled"
)
def test_two_process_train_step_parity(tmp_path):
    """The REAL RADNeRFTask.train_step across 2 processes (4+4 virtual
    devices) reproduces the single-process 8-device loss and updated
    parameters — the multi-host analog of the in-process DP parity the
    dryrun asserts (VERDICT r4 #8). Both runs share one synthetic dataset
    and seed, so any divergence isolates the cross-process collective."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.make_synthetic_dataset import make_dataset

    data = str(tmp_path / "data")
    make_dataset(data, n_frames=6, hw=32)
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(
        os.environ,
        GF_COORD=f"localhost:{port}",
        GF_REPO=os.path.join(os.path.dirname(__file__), ".."),
        GF_DATA=data,
        GF_CHECK_GLOBAL_BATCH="1",
        JAX_PLATFORMS="cpu",
    )
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    # single-process 8-device reference
    env_s = dict(env, GF_SINGLE="1")
    ref = subprocess.run(
        [sys.executable, str(worker), "0"], env=env_s,
        capture_output=True, text=True, timeout=900,
    )
    assert ref.returncode == 0, ref.stdout[-3000:] + ref.stderr[-3000:]
    ref_line = [l for l in ref.stdout.splitlines()
                if l.startswith("TRAINRESULT")][0]
    ref_loss, ref_sum = map(float, ref_line.split()[1:])

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("TRAINRESULT")][0]
        loss, csum = map(float, line.split()[1:])
        assert abs(loss - ref_loss) <= 1e-4 * max(1.0, abs(ref_loss)), (
            f"proc {i} loss {loss} vs single-process {ref_loss}"
        )
        assert abs(csum - ref_sum) <= 1e-3 * max(1.0, abs(ref_sum)), (
            f"proc {i} param checksum {csum} vs single-process {ref_sum}"
        )
