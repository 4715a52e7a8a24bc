"""Minimal 'diffusers' stand-in so the reference's diffusers_rewrite UNets can
be imported for parity testing without the (incompatible) vendored fork.

The rewritten UNets only use ModelMixin (an nn.Module base) and
ConfigMixin.register_to_config (reference diffusers_rewrite/sd.py:14-15,
500-504); everything else in diffusers is irrelevant to the model math.
"""
import sys
import types


def install_diffusers_shim():
    if "diffusers" in sys.modules:
        return
    import torch

    class _Config:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    class ModelMixin(torch.nn.Module):
        pass

    class ConfigMixin:
        def register_to_config(self, **kwargs):
            self.config = _Config(**kwargs)

    diffusers = types.ModuleType("diffusers")
    models = types.ModuleType("diffusers.models")
    modeling_utils = types.ModuleType("diffusers.models.modeling_utils")
    configuration_utils = types.ModuleType("diffusers.configuration_utils")
    modeling_utils.ModelMixin = ModelMixin
    configuration_utils.ConfigMixin = ConfigMixin
    models.modeling_utils = modeling_utils
    diffusers.models = models
    diffusers.configuration_utils = configuration_utils
    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.models"] = models
    sys.modules["diffusers.models.modeling_utils"] = modeling_utils
    sys.modules["diffusers.configuration_utils"] = configuration_utils
