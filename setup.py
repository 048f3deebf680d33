"""Build script: package + optional native extension.

The native extensions provide multithreaded GIL-releasing host kernels:
`runia_core_tpu._native` (data-path batch assembly, native/dataloader.cpp)
and `runia_core_tpu._native_osod` (open-set greedy matching,
native/osod_eval.cpp). The package works without them (numpy/Python
fallbacks are semantically identical); build in-tree with:

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
    ),
    Extension(
        "runia_core_tpu._native_osod",
        sources=["native/osod_eval.cpp"],
        language="c++",
        extra_compile_args=["-O3", "-std=c++17", "-pthread"],
        extra_link_args=["-pthread"],
        optional=True,
    ),
]

setup(ext_modules=ext_modules)
