"""Option pricing: Hedged Monte Carlo and Black-Scholes utilities."""
from shadowing_tpu.pricing.black_scholes import bs_call_price, bs_implied_vol
from shadowing_tpu.pricing.hedged_mc import Smile, compute_smile, compute_smile_batch
