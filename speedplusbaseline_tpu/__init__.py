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


def _respect_jax_platforms_env() -> None:
    """Make the JAX_PLATFORMS env var authoritative.

    This machine's TPU plugin boot (sitecustomize) calls
    ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter
    startup, which silently overrides a user/CI ``JAX_PLATFORMS=cpu`` env
    setting. CPU-only test runs then still initialize the TPU backend and
    block on the single-process TPU claim. Re-applying the env var here (at
    package import, before any backend initializes) restores the documented
    JAX behavior: set JAX_PLATFORMS=cpu and you get CPU.
    """
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            import jax

            if jax.config.jax_platforms != env:
                jax.config.update("jax_platforms", env)
        except Exception:
            pass


_respect_jax_platforms_env()
