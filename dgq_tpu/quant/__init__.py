"""Quantizer math core: scale initializers, affine fake-quant, log2 softmax
quantizer, AdaRound. All pure functions on jax arrays / pytrees."""

from dgq_tpu.quant.affine import (  # noqa: F401
    QParams,
    fake_quant,
    quant_bounds,
    ste_round,
)
from dgq_tpu.quant.scalers import (  # noqa: F401
    Scaler,
    init_scale,
    init_scale_channelwise,
    lp_loss,
)
from dgq_tpu.quant.log2 import (  # noqa: F401
    log2_fake_quant,
    log2_init_delta,
    log2_real_time_quant,
)
from dgq_tpu.quant.adaround import (  # noqa: F401
    adaround_init_alpha,
    adaround_quant,
    adaround_soft_targets,
    rounding_reg_loss,
)
