"""Load reference torch model files as import-isolated modules (test oracle).

The reference package (/root/reference/vsdeoldify) cannot be imported
normally: its package __init__ pulls VapourSynth, and several model files
import unavailable third-party packages (torchvision,
spatial_correlation_sampler).  For conversion-parity tests we only need the
bare nn.Module definitions, so this helper

* registers STUB parent packages (so ``vsdeoldify.x.y`` leaf imports resolve
  against the real directories without executing any real ``__init__.py``),
* stubs the unavailable third-party modules, and
* loads requested leaf modules by file path.

Reference files are used strictly as numerical oracles inside tests — no
reference code is copied into the framework.
"""
from __future__ import annotations

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference"

_PKG_DIRS = {
    "vsdeoldify": f"{REF_ROOT}/vsdeoldify",
    "vsdeoldify.colormnet": f"{REF_ROOT}/vsdeoldify/colormnet",
    "vsdeoldify.colormnet.model": f"{REF_ROOT}/vsdeoldify/colormnet/model",
    "vsdeoldify.colormnet.util": f"{REF_ROOT}/vsdeoldify/colormnet/util",
    "vsdeoldify.colormnet.inference": f"{REF_ROOT}/vsdeoldify/colormnet/inference",
    "vsdeoldify.deepex": f"{REF_ROOT}/vsdeoldify/deepex",
    "vsdeoldify.deepex.models": f"{REF_ROOT}/vsdeoldify/deepex/models",
    "vsdeoldify.deepex.utils": f"{REF_ROOT}/vsdeoldify/deepex/utils",
    "vsdeoldify.remaster": f"{REF_ROOT}/vsdeoldify/remaster",
    "vsdeoldify.remaster.model": f"{REF_ROOT}/vsdeoldify/remaster/model",
    "vsdeoldify.colormnet.dataset": f"{REF_ROOT}/vsdeoldify/colormnet/dataset",
    "vsdeoldify.colorization": f"{REF_ROOT}/vsdeoldify/colorization",
    "vsdeoldify.colorization.colorizers": f"{REF_ROOT}/vsdeoldify/colorization/colorizers",
    "vsdeoldify.deoldify": f"{REF_ROOT}/vsdeoldify/deoldify",
    "vsdeoldify.fastai": f"{REF_ROOT}/vsdeoldify/fastai",
    "vsdeoldify.vsslib": f"{REF_ROOT}/vsdeoldify/vsslib",
}


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_stubs():
    if "vapoursynth" not in sys.modules or not getattr(
        sys.modules.get("vapoursynth"), "_havc_test_stub", False
    ):
        vs = types.ModuleType("vapoursynth")
        vs._havc_test_stub = True
        vs.__file__ = "<vapoursynth-stub>"

        class _Node:  # placeholder types used in reference annotations
            pass

        vs.VideoNode = _Node
        vs.VideoFrame = _Node
        vs.core = types.SimpleNamespace(
            log_message=lambda *a, **k: None, std=None
        )

        def _vs_getattr(name):  # PEP 562: any constant the reference reads
            if name.startswith("__"):
                raise AttributeError(name)
            return 0

        vs.__getattr__ = _vs_getattr
        sys.modules["vapoursynth"] = vs

    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv.__path__ = []  # mark as package so submodule imports resolve
        for sub in ("models", "transforms", "utils"):
            mod = _stub_module(f"torchvision.{sub}")
            setattr(tv, sub, mod)
        _populate_torchvision_models(sys.modules["torchvision.models"])
        _populate_torchvision_transforms(sys.modules["torchvision.transforms"])


def _populate_torchvision_transforms(tr_mod):
    """Functional Normalize/Compose/ToTensor for the torchvision stub —
    enough for the reference's range_transform.py constants and the
    colormnet_render im_transform pipelines (CHW tensors)."""
    import torch as _torch

    class Normalize:
        def __init__(self, mean, std):
            self.mean = _torch.tensor(mean, dtype=_torch.float32)
            self.std = _torch.tensor(std, dtype=_torch.float32)

        def __call__(self, x):
            m = self.mean.view(-1, *([1] * (x.dim() - 1)))
            s = self.std.view(-1, *([1] * (x.dim() - 1)))
            return (x - m) / s

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tr_mod.Normalize = Normalize
    tr_mod.Compose = Compose

    class InterpolationMode:
        BILINEAR = "bilinear"

    tr_mod.InterpolationMode = InterpolationMode


def _populate_torchvision_models(models_mod):
    """Functional resnet constructors for the torchvision stub, built on
    the reference's own resnet blocks (colormnet/model/resnet.py) with
    avgpool/fc appended so fastai's create_body children-slicing ([:-2])
    matches real torchvision.  Random init only (offline)."""
    import torch.nn as tnn

    def _make(block_name, layers):
        def ctor(pretrained=False, **kw):
            rs = load_ref_module("vsdeoldify.colormnet.model.resnet")
            block = getattr(rs, block_name)
            net = rs.ResNet(block, layers)
            net.avgpool = tnn.AdaptiveAvgPool2d(1)
            net.fc = tnn.Linear(512 * block.expansion, 1000)
            return net

        return ctor

    models_mod.resnet18 = _make("BasicBlock", (2, 2, 2, 2))
    models_mod.resnet34 = _make("BasicBlock", (3, 4, 6, 3))
    models_mod.resnet50 = _make("Bottleneck", (3, 4, 6, 3))
    models_mod.resnet101 = _make("Bottleneck", (3, 4, 23, 3))
    models_mod.resnet152 = _make("Bottleneck", (3, 8, 36, 3))

    class ResNet:  # isinstance checks only
        pass

    models_mod.ResNet = ResNet

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stub: model family unavailable")

    for name in ("SqueezeNet", "squeezenet1_0", "squeezenet1_1",
                 "densenet121", "densenet169", "densenet201", "densenet161",
                 "vgg16_bn", "vgg19_bn", "alexnet"):
        setattr(models_mod, name, _unavailable)

    if "fastprogress" not in sys.modules:
        # fastai/imports/core.py checks importlib.metadata.version(), which
        # scans sys.path for dist-info — provide one alongside the stub
        import tempfile

        meta_root = os.path.join(
            tempfile.gettempdir(), "havc_test_distinfo")
        dist = os.path.join(meta_root, "fastprogress-1.0.3.dist-info")
        os.makedirs(dist, exist_ok=True)
        meta = os.path.join(dist, "METADATA")
        if not os.path.exists(meta):
            with open(meta, "w") as f:
                f.write("Metadata-Version: 2.1\nName: fastprogress\n"
                        "Version: 1.0.3\n")
        if meta_root not in sys.path:
            sys.path.insert(0, meta_root)

        fp = _stub_module("fastprogress")
        fp.__path__ = []

        class _Bar:
            def __init__(self, *a, **k):
                pass

            def update(self, *a, **k):
                pass

        sub = _stub_module(
            "fastprogress.fastprogress",
            MasterBar=_Bar, ProgressBar=_Bar,
            master_bar=_Bar, progress_bar=_Bar,
            format_time=lambda t: str(t), IN_NOTEBOOK=False,
        )
        fp.fastprogress = sub

    if "skimage" not in sys.modules:
        sk = _stub_module("skimage")
        sk.__path__ = []
        for sub in ("color", "io", "metrics"):
            mod = _stub_module(f"skimage.{sub}")
            setattr(sk, sub, mod)

    # spatial_correlation_sampler: constructible (network.py builds it with
    # enable_corr=True by default) but fails loudly if actually CALLED
    if "spatial_correlation_sampler" not in sys.modules:
        class _SCS:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                raise RuntimeError("spatial_correlation_sampler stub called")

        _stub_module(
            "spatial_correlation_sampler", SpatialCorrelationSampler=_SCS
        )


def _install_leaf_stubs():
    """Reference leaves with import-time side effects that would fail
    offline: vgg19_gray torch.load()s a checkpoint at module scope
    (vgg19_gray.py:130) — not needed for WarpNet/ColorVidNet oracles."""
    name = "vsdeoldify.deepex.models.vgg19_gray"
    if name not in sys.modules:
        _stub_module(
            name,
            vgg19_gray=lambda *a, **k: None,
            vgg19_gray_new=lambda *a, **k: None,
        )


def _install_parent_packages():
    for name, path in _PKG_DIRS.items():
        if name in sys.modules:
            continue
        pkg = types.ModuleType(name)
        pkg.__path__ = [path]
        pkg.__package__ = name
        sys.modules[name] = pkg


def load_ref_module(dotted: str) -> types.ModuleType:
    """Load e.g. 'vsdeoldify.colormnet.model.modules' from the reference
    tree without executing any real package __init__."""
    _install_stubs()
    _install_parent_packages()
    _install_leaf_stubs()
    if dotted in sys.modules and not isinstance(
        getattr(sys.modules[dotted], "__path__", None), list
    ):
        return sys.modules[dotted]
    parent = dotted.rsplit(".", 1)[0]
    leaf = dotted.rsplit(".", 1)[1]
    path = f"{_PKG_DIRS[parent]}/{leaf}.py"
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    _block_pretrained_downloads()
    return mod


def _block_pretrained_downloads():
    """The reference resnet constructors default to pretrained=True which
    hits the network (model_zoo) — force-random init for offline tests
    (imagenet stem weights are irrelevant to conversion parity).  The
    resnet module may have been pulled in transitively by another leaf, so
    patch whatever instance is in sys.modules (idempotent)."""
    resnet_mod = sys.modules.get("vsdeoldify.colormnet.model.resnet")
    if resnet_mod is None or getattr(resnet_mod, "_havc_nopretrain", False):
        return
    orig18, orig50 = resnet_mod.resnet18, resnet_mod.resnet50
    resnet_mod.resnet18 = lambda pretrained=True, extra_dim=0: orig18(
        False, extra_dim
    )
    resnet_mod.resnet50 = lambda pretrained=True, extra_dim=0: orig50(
        False, extra_dim
    )
    resnet_mod._havc_nopretrain = True


def state_dict_numpy(torch_module, prefix: str = "") -> dict:
    """state_dict() -> {key: np.ndarray} with optional key prefix."""
    sd = torch_module.state_dict()
    return {
        f"{prefix}{k}": v.detach().cpu().numpy() for k, v in sd.items()
    }
