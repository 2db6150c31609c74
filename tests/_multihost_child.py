"""Child process for the 2-process jax.distributed CPU test
(tests/test_multihost.py). Each process owns 4 virtual CPU devices; the two
together form the 8-device global mesh. Loads its process-local slice of the
global batch through the real DataLoader path, assembles the global array via
make_array_from_process_local_data, runs one KRN train step, and dumps the
(replicated) results for the parent to compare against a single-process run.

Usage: python tests/_multihost_child.py <workdir> <process_id> <port> <outfile>
"""
import os
import sys

workdir, proc_id, port, outfile = sys.argv[1:5]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import speedplusbaseline_tpu  # noqa: E402  (re-applies JAX_PLATFORMS=cpu)
import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=int(proc_id))
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from speedplusbaseline_tpu.config import default_cfg  # noqa: E402
from speedplusbaseline_tpu.data import make_dataloader  # noqa: E402
from speedplusbaseline_tpu.engine import (  # noqa: E402
    build_optimizer,
    create_train_state,
    make_krn_train_step,
)
from speedplusbaseline_tpu.models import KeypointRegressionNet  # noqa: E402
from speedplusbaseline_tpu.parallel import (  # noqa: E402
    batch_sharding,
    make_mesh,
    replicated_sharding,
)

cfg = default_cfg(dataroot=workdir, input_shape=(64, 64), batch_size=8,
                  eval_batch_size=4, num_workers=2, max_epochs=1,
                  optimizer="adamw", lr=1e-3, weight_decay=0.01)

mesh = make_mesh()
data_sh = batch_sharding(mesh)
rep_sh = replicated_sharding(mesh)

loader = make_dataloader(cfg, is_train=True, is_source=True, sharding=data_sh)
loader.set_epoch(0)
batch = next(iter(loader))
assert batch["image"].shape[0] == 8  # global batch

# Replicate the global batch so this host can read ALL rows — exercises a
# cross-process all-gather and lets the parent verify global assembly.
gather = jax.jit(lambda x: x, out_shardings=rep_sh)
image_global = np.asarray(gather(batch["image"]))
keypts_global = np.asarray(gather(batch["keypts"]))

model = KeypointRegressionNet(cfg.num_keypoints)
tx = build_optimizer(cfg, steps_per_epoch=10)
state = create_train_state(model, tx, jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
state = jax.device_put(state, rep_sh)
step = make_krn_train_step(model, tx, cfg, style_aug=None)
state, sm = step(state, batch, jax.random.PRNGKey(1), None)
jax.block_until_ready(state.params)

leaves = jax.tree_util.tree_leaves(state.params)
param_norms = np.asarray([float(jnp.linalg.norm(l.astype(jnp.float32)))
                          for l in leaves])

# --- Validation under 2 processes (run_validation's _fetch_global path:
# per-example eval outputs are batch-sharded, the all-gather must make them
# host-readable on every process; eval loader pads 4 rows -> the 8-wide mesh,
# exercising the pad+mask path multi-host too).
import os.path as osp  # noqa: E402

from speedplusbaseline_tpu.engine import make_krn_eval_step  # noqa: E402
from speedplusbaseline_tpu.engine.loops import run_validation  # noqa: E402
from speedplusbaseline_tpu.io_utils import (  # noqa: E402
    load_camera_intrinsics,
    load_tango_3d_keypoints,
)

cfg.logdir = osp.join(workdir, f"log_child{proc_id}")
eval_loader = make_dataloader(cfg, is_train=False, is_source=False,
                              sharding=data_sh)
corners3d = load_tango_3d_keypoints(cfg.keypts_3d_model)
K_cam, dist = load_camera_intrinsics(osp.join(workdir, "speedplus",
                                              "camera.json"))
eval_step = make_krn_eval_step(model, corners3d, K_cam, dist)
meters = run_validation(1, cfg, eval_step, state.params, state.batch_stats,
                        eval_loader, writer=None)
valid_metrics = np.asarray([meters["eR"].avg, meters["eT"].avg,
                            meters["speed (raw)"].avg])

# --- Checkpoint on process 0, barrier, resume on BOTH, one more step:
# the multi-host crash-resume contract (train.py:122-127 + loader feeding).
from jax.experimental import multihost_utils  # noqa: E402

from speedplusbaseline_tpu.engine.state import restore_train_state  # noqa: E402
from speedplusbaseline_tpu.io_utils.checkpoint import (  # noqa: E402
    CKPT_NAME,
    load_checkpoint,
    save_checkpoint,
)

savedir = osp.join(workdir, "save_multihost")
if jax.process_index() == 0:
    save_checkpoint(state.as_checkpoint_dict(1, "krn", 1), False, savedir)
multihost_utils.sync_global_devices("ckpt_saved")

fresh = create_train_state(model, tx, jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
fresh = jax.device_put(fresh, rep_sh)
template = fresh.as_checkpoint_dict(0, "krn", 0)
ckpt = load_checkpoint(osp.join(savedir, CKPT_NAME), template)
resumed = restore_train_state(fresh, ckpt)
assert int(ckpt["epoch"]) == 1

loader.set_epoch(1)
batch2 = next(iter(loader))
resumed, _ = step(resumed, batch2, jax.random.PRNGKey(2), None)
jax.block_until_ready(resumed.params)
r_leaves = jax.tree_util.tree_leaves(resumed.params)
resumed_norms = np.asarray([float(jnp.linalg.norm(l.astype(jnp.float32)))
                            for l in r_leaves])

np.savez(outfile,
         image=image_global, keypts=keypts_global,
         loss_x=float(sm["loss_x"]), loss_y=float(sm["loss_y"]),
         first_leaf=np.asarray(leaves[0]), param_norms=param_norms,
         valid_metrics=valid_metrics,
         resumed_first_leaf=np.asarray(r_leaves[0]),
         resumed_norms=resumed_norms)
print("CHILD_OK", proc_id)
