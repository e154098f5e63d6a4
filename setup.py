"""Build/install pytorch_sparse_tpu.

Mirrors the reference's build surface (``setup.py:21-37`` env flags) in
TPU terms: the only native artifact is the host-side C++ sampling
library, compiled as a plain shared object (no torch, no pybind).

Environment flags:
  FORCE_ONLY_PYTHON=1   skip the native build (numpy fallbacks only)
  CXX=...               compiler override (default g++)
  WITH_SYMBOLS=1        keep debug symbols
"""

import os
import subprocess
import sys

from setuptools import find_packages, setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        if os.environ.get("FORCE_ONLY_PYTHON") != "1":
            here = os.path.dirname(os.path.abspath(__file__))
            csrc = os.path.join(here, "pytorch_sparse_tpu", "csrc")
            cxx = os.environ.get("CXX", "g++")
            flags = ["-O3", "-march=native", "-fPIC", "-shared",
                     "-std=c++17"]
            if os.environ.get("WITH_SYMBOLS") == "1":
                flags.append("-g")
            cmd = [cxx, *flags, "-o",
                   os.path.join(csrc, "libsparse_tpu_native.so"),
                   os.path.join(csrc, "native.cpp")]
            try:
                subprocess.check_call(cmd)
            except (OSError, subprocess.CalledProcessError) as e:
                print(f"native build skipped ({e}); numpy fallbacks "
                      "will be used", file=sys.stderr)
        super().run()


setup(
    name="pytorch_sparse_tpu",
    version="0.1.0",
    description=(
        "TPU-native sparse linear algebra with the capabilities of "
        "rusty1s/pytorch_sparse (JAX/XLA/Pallas)"
    ),
    packages=find_packages(include=["pytorch_sparse_tpu*"]),
    package_data={"pytorch_sparse_tpu.csrc": ["*.so", "*.cpp", "build.sh"]},
    python_requires=">=3.10",
    install_requires=["jax", "numpy"],
    extras_require={
        "test": ["pytest", "scipy"],
        "models": ["optax"],
    },
    cmdclass={"build_py": BuildWithNative},
)
