"""speedplusbaseline_tpu — a TPU-native (JAX/XLA/Pallas) framework with the full
capabilities of the SPEED+ baseline (tpark94/speedplusbaseline).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  cli (repo-root train.py/test.py/adapt.py/preprocess.py)
    config.py         — argparse surface with reference parity (config.py:9-64)
    engine/           — jitted train/eval steps, DP mesh, optimizers, schedules
    models/           — flax KRN / SPN / RevGrad / Ghiasi (NHWC, bf16-capable)
    augment/          — on-device photometric+geometric augs, style augmentor
    data/             — CSV datasets, host decode+crop, device prefetch
    geometry/         — quaternions, projection, batched EPnP, SPN GN solver
    metrics/          — SPEED+ eR/eT/speed scoring
    ops/              — Pallas TPU kernels (fused instance-norm+FiLM, augs)
    parallel/         — jax.sharding Mesh helpers (data-parallel over ICI)
    io_utils/         — checkpointing, TensorBoard/JSONL summaries, meters
    native/           — C++ data-loader core (libjpeg decode + crop/resize)
"""

__version__ = "0.1.0"
