"""Build hooks for the native C++ components.

The ctypes-loaded shared libraries (FLAC decoder, grouping engine) are
compiled from native/*.cpp. In the repo layout they build via `make -C
native` on first use; for wheels/installs this setup.py compiles them as
extension modules placed inside the package (the loaders look there when
the repo layout is absent). They export a plain C ABI — no PyInit symbol —
which is fine because they are dlopen'd via ctypes, never imported.

    python setup.py build_ext --inplace   # dev: put the .so files in-package
"""

from setuptools import setup
from setuptools.command.build_ext import build_ext
from setuptools.extension import Extension


class CtypesExtension(Extension):
    pass


class build_ext_ctypes(build_ext):
    def get_export_symbols(self, ext):
        # ctypes libraries have no PyInit_<name>; don't require one (MSVC)
        if isinstance(ext, CtypesExtension):
            return []
        return super().get_export_symbols(ext)


setup(
    ext_modules=[
        CtypesExtension(
            "wav2vec2_tpu._flacdec",
            sources=["native/flac_decoder.cpp"],
            extra_compile_args=["-O2", "-std=c++17"],
            language="c++",
        ),
        CtypesExtension(
            "wav2vec2_tpu._grouping",
            sources=["native/grouping.cpp"],
            extra_compile_args=["-O2", "-std=c++17"],
            language="c++",
        ),
    ],
    cmdclass={"build_ext": build_ext_ctypes},
)
