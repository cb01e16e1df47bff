"""Load reference alphaDIA modules as pure-Python test oracles.

The reference implementation (when present at ``/root/reference``) is the
ground truth this engine re-implements.  Its hot modules are numba-jitted
and depend on vendor packages (numba/alphatims/rocket_fft) that are not
installable here — but the *python semantics* of the decorated functions
are exactly what we want to compare against, so this module installs
no-op stand-ins for those decorators and imports the reference modules to
execute them as plain Python on small inputs.

Nothing here is imported by the engine itself; it exists only so the
parity tests can diff our numerics against the reference's directly.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")


def _decorator(*args, **kwargs):
    """A decorator usable bare (@njit) or parameterized (@njit(cache=True))."""
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(obj):
        return obj

    return deco


class _TypeExpr:
    """Stands in for numba type expressions (nb.float64[:, ::1] etc.)."""

    def __getitem__(self, item):
        return self

    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return self


def _pjit(*a, **k):
    """alphatims.utils.pjit: decorated f(thread_idx, *args) is called with
    an iterable first argument and fanned out over threads; serially here."""

    def deco(f):
        def wrapper(indices, *args, **kw):
            for i in np.asarray(list(indices)).ravel():
                f(int(i), *args, **kw)

        return wrapper

    if len(a) == 1 and callable(a[0]) and not k:
        return deco(a[0])
    return deco


def install_stubs() -> None:
    if "numba" in sys.modules and not hasattr(sys.modules["numba"], "_parity_stub"):
        raise RuntimeError("a real numba is importable; stubbing would shadow it")
    if "numba" in sys.modules:
        return

    nb = types.ModuleType("numba")
    nb._parity_stub = True
    nb.njit = _decorator
    nb.jit = _decorator
    nb.vectorize = _decorator
    nb.guvectorize = _decorator
    nb.prange = range
    nb.set_num_threads = lambda n: None
    for t in (
        "float32", "float64", "int8", "int16", "int32", "int64",
        "uint8", "uint16", "uint32", "uint64", "boolean", "types",
    ):
        setattr(nb, t, _TypeExpr())

    experimental = types.ModuleType("numba.experimental")
    experimental.jitclass = _decorator
    extending = types.ModuleType("numba.extending")
    extending.overload = lambda *a, **k: (lambda f: f)
    extending.overload_method = lambda *a, **k: (lambda f: f)
    extending.register_jitable = _decorator
    typed = types.ModuleType("numba.typed")
    typed.List = list
    typed.Dict = dict
    core = types.ModuleType("numba.core")
    core.types = _TypeExpr()

    alphatims = types.ModuleType("alphatims")
    atutils = types.ModuleType("alphatims.utils")
    atutils.pjit = _pjit
    atutils.njit = _decorator
    atutils.set_threads = lambda n: n
    alphatims.utils = atutils

    def _module_getattr(name):
        # never answer dunder probes (__file__, __path__, …): inspect &
        # importlib walk sys.modules and would choke on fake values
        if name.startswith("__"):
            raise AttributeError(name)
        return lambda *a, **k: None

    rocket = types.ModuleType("rocket_fft")
    rocket.__getattr__ = _module_getattr
    rocket_ov = types.ModuleType("rocket_fft.overloads")
    rocket_ov.__getattr__ = _module_getattr

    mods = {
        "numba": nb,
        "numba.experimental": experimental,
        "numba.extending": extending,
        "numba.typed": typed,
        "numba.core": core,
        "alphatims": alphatims,
        "alphatims.utils": atutils,
        "rocket_fft": rocket,
        "rocket_fft.overloads": rocket_ov,
    }
    sys.modules.update(mods)
    nb.experimental = experimental
    nb.extending = extending
    nb.typed = typed
    nb.core = core

    # the reference targets pandas<3; restore the name it imports
    import pandas.errors

    if not hasattr(pandas.errors, "SettingWithCopyWarning"):

        class SettingWithCopyWarning(Warning):
            pass

        pandas.errors.SettingWithCopyWarning = SettingWithCopyWarning


def ref_module(dotted: str, file: str | None = None):
    """Import a reference module (``alphadia.x.y``) with stubs installed.

    ``file`` (path relative to the reference root) loads the module
    directly from its source file, bypassing heavyweight package
    ``__init__`` chains (e.g. ``alphadia.raw_data`` pulls alpharaw).
    """
    install_stubs()
    root = str(REFERENCE_ROOT)
    if root not in sys.path:
        sys.path.insert(0, root)
    if file is None:
        return importlib.import_module(dotted)
    key = f"_refparity_{dotted.replace('.', '_')}"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(key, REFERENCE_ROOT / file)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod
