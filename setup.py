"""Build script: package + optional native extension.

The native extension (`runia_core_tpu._native`) provides the multithreaded
GIL-releasing host data-path kernels (native/dataloader.cpp). The package
works without it (runia_core_tpu/data.py falls back to numpy); build in-tree
with:

    python setup.py build_ext --inplace
"""

from setuptools import Extension, setup

ext_modules = [
    Extension(
        "runia_core_tpu._native",
        sources=["native/dataloader.cpp"],
        language="c++",
        extra_compile_args=["-O3", "-std=c++17", "-pthread"],
        extra_link_args=["-pthread"],
        optional=True,  # package installs fine without a compiler
    )
]

setup(ext_modules=ext_modules)
