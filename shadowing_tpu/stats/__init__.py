"""Averaging measures and realized-variance statistics."""
from shadowing_tpu.stats.proba import DiscreteProba, Softmax, Uniform
from shadowing_tpu.stats.realized import ANNUALIZATION, get_RV, realized_variance
