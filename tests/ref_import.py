"""Helpers for importing the genuine reference dataset modules in tests."""

import importlib
import inspect
import sys
import types


def stub_torchvision():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")

    class _Dummy:
        def __init__(self, *a, **k):
            pass

    for name in ("Normalize", "Compose", "Resize", "CenterCrop", "ToTensor",
                 "RandomCrop", "RandomResizedCrop", "Scale"):
        setattr(tv_t, name, _Dummy)
    tv.transforms = tv_t
    tv.get_image_backend = lambda: "PIL"
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tv_t


def load_reference_dataset(name):
    stub_torchvision()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module(f"datasets.{name}")


def instantiate(cls, **available):
    """Build a reference Dataset via signature inspection (the variants'
    __init__ argument lists differ slightly)."""
    sig = inspect.signature(cls.__init__)
    kwargs = {}
    for pname, param in list(sig.parameters.items())[1:]:
        if pname in available:
            kwargs[pname] = available[pname]
        elif param.default is inspect.Parameter.empty:
            raise TypeError(f"{cls}: missing required arg {pname}")
    return cls(**kwargs)
