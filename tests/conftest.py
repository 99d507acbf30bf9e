"""Test config: run everything on a virtual 8-device CPU mesh.

The TPU-native analogue of "test multi-node without a cluster"
(SURVEY.md §4): XLA fakes 8 host devices so sharding/collective code paths
are exercised without TPU hardware. Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU platform
# bench.py's supervisor serializes on the real chip lock; tests must never
# wait on it (the experiment queues hold it for hours while training)
os.environ["SF_TPU_LOCK"] = "/tmp/tpu_test.lock"
os.environ["SF_TPU_LOCK_WAIT"] = "5"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU platform and rewrites
# jax_platforms to "axon,cpu"; pin back to cpu before backends initialize.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
