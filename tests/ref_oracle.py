"""Import helpers for using the torch reference implementation as a test oracle.

The reference checkout (read-only, at REF_ROOT) is imported at test time to
produce expected numerical outputs; tests are skipped when it is absent.
No reference code lives in this repo.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import os
import sys

REF_ROOT = os.environ.get("MODITALKER_REF", "/root/reference")


def has_reference() -> bool:
    return os.path.isdir(REF_ROOT)


def _push_path(*subdirs: str):
    for s in subdirs:
        p = os.path.join(REF_ROOT, s)
        if p not in sys.path:
            sys.path.insert(0, p)


def _stub_missing(names: list[str]):
    """Install empty stub modules for heavy deps the reference imports at
    module scope but never touches in the pure-math paths we test against
    (torchvision image writers, cv2, tqdm wrappers)."""
    import types

    for name in names:
        try:
            importlib.import_module(name)
        except ImportError:
            parts = name.split(".")
            for i in range(1, len(parts) + 1):
                mod_name = ".".join(parts[:i])
                if mod_name not in sys.modules:
                    mod = types.ModuleType(mod_name)
                    mod.__path__ = []  # mark as package for submodule imports
                    # a real ModuleSpec so importlib.util.find_spec on the
                    # stub doesn't blow up in unrelated libraries
                    mod.__spec__ = importlib.machinery.ModuleSpec(
                        mod_name, loader=None, is_package=True)

                    def _getattr(attr, _m=mod_name):
                        # permissive access for "from x import y"; keep import
                        # machinery dunders out of it
                        if attr.startswith("__") and attr.endswith("__"):
                            raise AttributeError(attr)
                        return types.SimpleNamespace()

                    mod.__getattr__ = _getattr
                    sys.modules[mod_name] = mod


_STUBS = [
    "torchvision",
    "torchvision.utils",
    "torchvision.transforms",
    "cv2",
    "p_tqdm",
    "pyspng",
    "av",
    "natsort",
]


def import_atom_module(name: str):
    """Import e.g. 'model.utils' from the reference AToM package."""
    _push_path("AToM")
    _stub_missing(_STUBS)
    return importlib.import_module(name)


def import_mtov_module(name: str):
    """Import e.g. 'models.autoencoder.vit_modules' from reference MToV."""
    _push_path("MToV")
    _stub_missing(_STUBS)
    return importlib.import_module(name)
