"""Import smoke tests (reference tests/test_imports.py:5-25 equivalent)."""


def test_import_jax_stack():
    import flax
    import jax
    import numpy
    import optax
    import orbax.checkpoint  # noqa: F401

    assert jax.__version__
    assert flax.__version__
    assert optax.__version__
    assert numpy.__version__


def test_import_package():
    import trustedai_cl_vae_ad_tpu as tc

    assert tc.__version__
    assert callable(tc.load_config)
    assert callable(tc.load_model_from_directory)


def test_import_models():
    from trustedai_cl_vae_ad_tpu.models import (  # noqa: F401
        AbstractCVAE,
        KurtosisGlobalCVAE,
        KurtosisSingleCVAE,
        VAEModel,
    )

    assert KurtosisGlobalCVAE is not None
    assert KurtosisSingleCVAE is not None


def test_import_subsystems():
    from trustedai_cl_vae_ad_tpu.anomaly import cdf, offline  # noqa: F401
    from trustedai_cl_vae_ad_tpu.data import coco, ingest, loader, pipeline, raite  # noqa: F401
    from trustedai_cl_vae_ad_tpu.ops import moments, stream_score  # noqa: F401
    from trustedai_cl_vae_ad_tpu.parallel import dp, mesh, tp  # noqa: F401
    from trustedai_cl_vae_ad_tpu.stream import capture, engine  # noqa: F401
    from trustedai_cl_vae_ad_tpu.train import checkpoint, loop  # noqa: F401
    from trustedai_cl_vae_ad_tpu.utils import metrics, profiling  # noqa: F401


def test_src_compat_shims():
    """Reference-style imports keep working (drop-in compatibility)."""
    from src.abstract_cvae import AbstractCVAE  # noqa: F401
    from src.cdf_object import BSTProb, CDFObject  # noqa: F401
    from src.data_loader import load_data  # noqa: F401
    from src.kurtosis_global_cvae import KurtosisGlobalCVAE  # noqa: F401
    from src.kurtosis_single_cvae import KurtosisSingleCVAE  # noqa: F401
    from src.load_model import load_model_from_directory  # noqa: F401
    from src.raite_loader import RaiteDataset  # noqa: F401
    import src.utils  # noqa: F401  (empty in the reference; exists for parity)


def test_compile_cache_env_applied():
    """TCVAE_COMPILE_CACHE wires jax's persistent compilation cache at
    package import (serving cold-start: 406 -> 48 s on the flagship,
    BENCH_NOTES r4)."""
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        out = subprocess.run(
            [sys.executable, "-c",
             "import trustedai_cl_vae_ad_tpu, jax; "
             "print(jax.config.jax_compilation_cache_dir)"],
            env={"PATH": "/usr/bin:/bin", "TCVAE_PLATFORM": "cpu",
                 "TCVAE_COMPILE_CACHE": d, "HOME": "/root",
                 "PYTHONPATH": "/root/repo"},
            capture_output=True, text=True, timeout=180,
        )
        assert out.returncode == 0, out.stderr
        assert d in out.stdout
