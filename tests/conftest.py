"""Test config: force JAX onto a virtual 8-device CPU platform.

Real-TPU benchmarking happens in bench.py; tests are deterministic CPU runs
and exercise the multi-chip sharding path on a virtual mesh
(xla_force_host_platform_device_count=8).

Set IDK_TEST_TPU=1 to keep the real platform instead — this enables the
hardware-marked tests (interpret=False Pallas kernels, Mosaic DMA layout
checks) that are skipped on the CPU platform.
"""
import os

if os.environ.get("IDK_TEST_TPU", "") != "1":
    # The axon TPU plugin (registered via sitecustomize when
    # PALLAS_AXON_POOL_IPS is set) deadlocks device→host transfers in CPU
    # mode on this box — blank it so CPU test runs never register the plugin.
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_ENABLE_X64", "0")

    # The axon sitecustomize (PYTHONPATH=.axon_site) imports jax at
    # interpreter start when the pool env vars are set, so the env-var
    # overrides above come too late — jax's config snapshot already says
    # platforms=axon. Steer the live config instead (backends are not
    # initialized yet at conftest time).
    import sys  # noqa: E402

    if "jax" in sys.modules:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
        except Exception:
            pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (non-toy scenes on 1 CPU core)")
