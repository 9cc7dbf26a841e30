"""Multi-host training simulation: 2 CPU processes x 4 virtual devices.

Exercises the full multi-host path the reference covers with torchrun
(reference: setup.py:94-162): ``jax.distributed.initialize`` over a local
coordinator, a global 8-device mesh spanning both processes, per-process batch
shards assembled into global arrays, one sharded optimizer step, and an Orbax
multihost checkpoint save + restore.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]; ckpt_dir = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 8

import numpy as np
import jax.numpy as jnp
from motion324_tpu.config import load_config
from motion324_tpu.models.motion_model import ModelConfig, MotionLatentModel
from motion324_tpu.parallel.mesh import batch_sharding, make_mesh
from motion324_tpu.parallel.distributed import (global_batch_from_local,
                                                process_seed)
from motion324_tpu.training.checkpoints import auto_resume, save_checkpoint
from motion324_tpu.training.optimizer import create_optimizer
from motion324_tpu.training.train_step import TrainState, build_train_step

assert process_seed(7) == 7 + pid

mesh = make_mesh()  # 8 global devices over 2 processes
cfg = load_config("configs/dyscene.yaml",
                  ["training.warmup=2", "training.train_steps=10",
                   "training.grad_accum_steps=1"])
mcfg = ModelConfig(feat_dim=96, tokens=8, pcd_layers=1,
                   n_alternating_layers=2, head_dim=32, frames=2,
                   image_size=28, patch_size=14, dino_depth=1, dino_heads=3)
model = MotionLatentModel(mcfg)

def sample(b, seed):
    r = np.random.RandomState(seed)
    f = lambda *s: r.rand(*s).astype(np.float32)
    return {
        "ref_shape_pcd": f(b, 32, 3), "ref_shape_normals": f(b, 32, 3),
        "ref_shape_rgbs": f(b, 32, 3), "ref_pcd": f(b, 16, 3),
        "ref_normal": f(b, 16, 3), "ref_rgb": f(b, 16, 3),
        "rgb_video": f(b, 2, 28, 28, 3),
        "point_clouds": f(b, 2, 16, 3),
    }

# global batch 8 = 4 per process; init from identical (seed-0) global data
init_batch = sample(8, 0)
params = jax.jit(model.init)(jax.random.PRNGKey(0), init_batch)
tx, _ = create_optimizer(cfg)
state = TrainState.create(params, tx)
step_fn = build_train_step(model, tx, cfg, mesh)

local = jax.tree.map(lambda x: x[pid * 4:(pid + 1) * 4], sample(8, 1))
batch = global_batch_from_local(local, batch_sharding(mesh))
state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
loss = float(metrics["loss"])
assert np.isfinite(loss), loss

path = save_checkpoint(ckpt_dir, state)

fresh = TrainState.create(jax.jit(model.init)(jax.random.PRNGKey(2),
                                              init_batch), tx)
restored, rpath = auto_resume(ckpt_dir, fresh)
assert rpath is not None
# fwdbwd counter always advances; the update counter only when the step was
# applied (a random init can trip the grad-spike skip)
assert int(restored.step) == 1
assert int(restored.update_step) == int(1 - float(metrics["skipped"]))
a = np.asarray(jax.tree.leaves(restored.params)[0])
b = np.asarray(jax.tree.leaves(state.params)[0])
np.testing.assert_array_equal(a, b)
print(f"proc {pid}: loss={loss:.5f} ckpt={path} ok", flush=True)
"""


@pytest.mark.slow
@pytest.mark.slow
def test_two_process_cpu_training_and_checkpoint(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), str(port), str(tmp_path)],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid}:" in out and "ok" in out
    # both processes computed the SAME global loss (collective coherence)
    l0 = outs[0].split("loss=")[1].split(" ")[0]
    l1 = outs[1].split("loss=")[1].split(" ")[0]
    assert l0 == l1


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
