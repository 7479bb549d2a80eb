"""Build the native C extension: python setup_native.py build_ext --inplace."""

from setuptools import Extension, setup

setup(
    name="glomargridding-tpu-native",
    ext_modules=[
        Extension(
            "glomargridding_tpu.native._gridbin",
            sources=["glomargridding_tpu/native/gridbin.c"],
            extra_compile_args=["-O3"],
        )
    ],
)
