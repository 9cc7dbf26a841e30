"""Import the REFERENCE repo's torch modules as test oracles.

The reference tree at /root/reference is read-only public content used here
only to validate our weight converters numerically: its model classes are
instantiated with random weights and compared against our flax modules after
conversion. Heavy dependencies the reference expects (diffusers, trimesh,
pymeshlab, ...) are stubbed just enough for the MODEL modules to import —
pipelines are never exercised.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference/scripts"


def _stub(name, **attrs):
    import importlib.util
    if name not in sys.modules:
        try:  # never shadow a real installed module
            if importlib.util.find_spec(name) is not None:
                return None
        except (ImportError, ModuleNotFoundError, ValueError):
            pass
        import importlib.machinery
        m = types.ModuleType(name)
        m.__path__ = []  # mark as package
        # a real-looking spec so find_spec() probes (e.g. transformers') work
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None,
                                                    is_package=True)
        sys.modules[name] = m
    m = sys.modules[name]
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def install_stubs():
    class _Cfg:
        pass

    def _noop(*a, **k):
        return None

    _stub("trimesh", Trimesh=_Cfg, Scene=_Cfg, PointCloud=_Cfg)
    _stub("pymeshlab", MeshSet=_Cfg, Mesh=_Cfg)
    sk = _stub("skimage")
    skm = _stub("skimage.measure", marching_cubes=_noop)
    sk.measure = skm
    _stub("tqdm", tqdm=lambda x, **k: x)
    _stub("diffusers")
    _stub("diffusers.utils", BaseOutput=dict,
          logging=types.SimpleNamespace(get_logger=lambda *a, **k: None))
    _stub("diffusers.utils.torch_utils", randn_tensor=_noop)
    _stub("diffusers.utils.import_utils",
          is_accelerate_version=lambda *a, **k: False,
          is_accelerate_available=lambda *a, **k: False)
    _stub("diffusers.configuration_utils", ConfigMixin=object,
          register_to_config=lambda f: f)
    _stub("diffusers.schedulers.scheduling_utils", SchedulerMixin=object)
    _stub("diffusers.image_processor", VaeImageProcessor=_Cfg)
    # functional torchvision.transforms stub: the reference conditioner
    # builds Resize/CenterCrop/Normalize pipelines at __init__ and runs them
    # in forward (conditioner.py:80-104). Semantics match torchvision for
    # the (B, C, H, W) tensors the conditioner feeds them.
    import torch

    class _Resize:
        def __init__(self, size, interpolation=None, antialias=True):
            self.size = size
            self.antialias = bool(antialias)

        def __call__(self, x):
            import torch.nn.functional as F
            h, w = x.shape[-2:]
            if isinstance(self.size, int):
                if min(h, w) == self.size:
                    return x
                s = self.size / min(h, w)
                nh, nw = round(h * s), round(w * s)
            else:
                nh, nw = self.size
            return F.interpolate(x, (nh, nw), mode="bilinear",
                                 antialias=self.antialias,
                                 align_corners=False)

    class _CenterCrop:
        def __init__(self, size):
            self.size = (size, size) if isinstance(size, int) else size

        def __call__(self, x):
            h, w = x.shape[-2:]
            th, tw = self.size
            i, j = (h - th) // 2, (w - tw) // 2
            return x[..., i:i + th, j:j + tw]

    class _Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(-1, 1, 1)
            self.std = torch.tensor(std).view(-1, 1, 1)

        def __call__(self, x):
            return (x - self.mean.to(x.dtype)) / self.std.to(x.dtype)

    class _Compose:
        def __init__(self, fs):
            self.fs = fs

        def __call__(self, x):
            for f in self.fs:
                x = f(x)
            return x

    _stub("torchvision", transforms=types.SimpleNamespace(
        Compose=_Compose, Normalize=_Normalize, Resize=_Resize,
        CenterCrop=_CenterCrop, ToTensor=_noop,
        InterpolationMode=types.SimpleNamespace(
            BICUBIC=None, BILINEAR=None)))
    if REF not in sys.path:
        sys.path.insert(0, REF)


def ref_dit_module():
    """Reference hunyuan3ddit module, loaded standalone (torch+einops only)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_hunyuan3ddit",
        f"{REF}/hy3dgen/shapegen/models/denoisers/hunyuan3ddit.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def ref_shape_vae():
    """Reference ShapeVAE class (package import with stubbed deps)."""
    install_stubs()
    from hy3dgen.shapegen.models.autoencoders.model import ShapeVAE
    return ShapeVAE


def ref_conditioner_module():
    """Reference conditioner module (DinoImageEncoder[MV], wrappers)."""
    install_stubs()
    import importlib
    return importlib.import_module("hy3dgen.shapegen.models.conditioner")


def ref_hunyuanpaint_module():
    """Reference hunyuanpaint pipeline module (DDIMSolver, LCM scalings,
    get_predicted_original_sample — pipeline.py:84-165). Pipeline CLASSES in
    it are never instantiated; only the pure sampling-math helpers are used
    as oracles, so the diffusers surface is stubbed with empty classes."""
    install_stubs()

    class _C:
        def __init__(self, *a, **k):
            pass

    gen = {n: _C for n in (
        "AutoencoderKL DDPMScheduler DiffusionPipeline "
        "EulerAncestralDiscreteScheduler UNet2DConditionModel "
        "ImagePipelineOutput StableDiffusionInstructPix2PixPipeline "
        "LCMScheduler StableDiffusionPipeline ControlNetModel "
        "StableDiffusionControlNetPipeline StableDiffusionUpscalePipeline "
        "StableDiffusionXLControlNetImg2ImgPipeline "
        "KarrasDiffusionSchedulers").split()}
    _stub("diffusers", **gen)
    _stub("diffusers.callbacks", MultiPipelineCallbacks=_C,
          PipelineCallback=_C)
    _stub("diffusers.image_processor", PipelineImageInput=object)
    _stub("diffusers.pipelines")
    _stub("diffusers.pipelines.stable_diffusion")
    _stub("diffusers.pipelines.stable_diffusion.pipeline_output",
          StableDiffusionPipelineOutput=dict)
    _stub("diffusers.pipelines.stable_diffusion.pipeline_stable_diffusion",
          StableDiffusionPipeline=_C,
          retrieve_timesteps=lambda *a, **k: None,
          rescale_noise_cfg=lambda *a, **k: None)
    _stub("diffusers.schedulers", KarrasDiffusionSchedulers=_C,
          LCMScheduler=_C)
    _stub("diffusers.utils", deprecate=lambda *a, **k: None)
    _stub("diffusers.models", UNet2DConditionModel=_C)
    _stub("diffusers.models.attention_processor", Attention=_C)
    _stub("diffusers.models.transformers")
    _stub("diffusers.models.transformers.transformer_2d",
          BasicTransformerBlock=_C)
    _stub("xatlas")
    _stub("cv2", INTER_AREA=3, INTER_CUBIC=2, INTER_NEAREST=0, INTER_LINEAR=1)
    import importlib
    return importlib.import_module("hy3dgen.texgen.hunyuanpaint.pipeline")
