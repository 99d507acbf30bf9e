"""Run an experiment script on the CPU backend (validation / smoke runs).

The session env pins JAX_PLATFORMS=axon and a sitecustomize force-registers
the tunneled TPU platform, so plain `python script.py` always grabs the
chip. This launcher pins jax back to CPU *before* backends initialize
(tests/conftest.py pattern), then executes the target script as __main__:

    python experiments/_run_cpu.py experiments/phyre_fake_pipeline.py [args]
"""

import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

if __name__ == "__main__":
    target = sys.argv[1]
    sys.argv = sys.argv[1:]
    runpy.run_path(target, run_name="__main__")
