"""Path generators: scattering-spectra synthesis, MRW, PDV."""
from shadowing_tpu.models.mrw import MRWGenerator
from shadowing_tpu.models.pdv import (
    DEFAULT1,
    DEFAULT2,
    AutoregressiveLinearPredictor,
    PDVModel,
    PDVModelDiscrete,
    compute_factor,
    future_pdv_model,
    kernel_exp,
    kernel_pl,
)
