"""Rolling volatility-prediction backtest.

Production workflow from the Path Shadowing Monte Carlo paper
(arXiv:2308.01486, the reference's headline application): on every trading
date, shadow the trailing ``w`` days of the observed series against a
generated dataset, predict the realized variance of the next ``Ts`` days,
and score the predictions against what actually happened — optionally
against the Guyon–Lekeufack autoregressive linear benchmark
(:class:`shadowing_tpu.models.pdv.AutoregressiveLinearPredictor`).

TPU design: all dates are just the context batch axis — one fused search
scores every (date x trajectory x window) triple; dates stream in chunks
through ``predict`` to bound memory. ~10k dates x 32k trajectories x 4k
windows is a single-chip workload; shard the dataset axis over a mesh
(:mod:`shadowing_tpu.parallel`) to go bigger.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from shadowing_tpu.array_types import Array, dim_bct
from shadowing_tpu.data.price_data import PriceData
from shadowing_tpu.data.windows import windows
from shadowing_tpu.shadow.engine import PathShadowing
from shadowing_tpu.stats.realized import realized_variance


@dataclass
class BacktestResult:
    """Per-date volatility predictions and their realized outcomes."""

    Ts: np.ndarray                # maturities (days)
    dates: Optional[np.ndarray]   # (n_dates,) or None
    predicted: np.ndarray         # (n_dates, len(Ts)) annualised variance
    predicted_std: np.ndarray     # (n_dates, len(Ts))
    realized: np.ndarray          # (n_dates, len(Ts)) annualised variance

    def rmse(self) -> np.ndarray:
        """Root mean squared error per maturity, in vol units."""
        return np.sqrt(
            ((np.sqrt(self.predicted) - np.sqrt(self.realized)) ** 2).mean(0)
        )

    def correlation(self) -> np.ndarray:
        """Pearson correlation of predicted vs realized vol per maturity."""
        out = []
        for i in range(len(self.Ts)):
            p = np.sqrt(self.predicted[:, i])
            r = np.sqrt(self.realized[:, i])
            out.append(np.corrcoef(p, r)[0, 1])
        return np.asarray(out)

    def summary(self) -> str:
        lines = ["maturity  rmse(vol)  corr"]
        for T, e, c in zip(self.Ts, self.rmse(), self.correlation()):
            lines.append(f"{int(T):8d}  {e:9.4f}  {c:4.2f}")
        return "\n".join(lines)


def rolling_backtest(
    engine: PathShadowing,
    series: PriceData | Array,
    w: int,
    Ts: Sequence[int],
    k: int = 1024,
    stride: int = 1,
    eta: float = 0.1,
    proba_name: str = "softmax",
    n_context_splits: Optional[int] = None,
    n_dataset_splits: Optional[int] = None,
    method: str = "auto",
    dates: Optional[np.ndarray] = None,
) -> BacktestResult:
    """Backtest PSMC volatility prediction over a historical series.

    :param engine: a :class:`PathShadowing` built on a generated dataset with
        a ``PredictionContext(horizon >= max(Ts))``
    :param series: observed log-returns (``PriceData`` or array)
    :param w: context length in days (must equal the embedding width)
    :param Ts: prediction maturities in days
    :param stride: step between prediction dates
    :param dates: optional datetimes aligned to the series' returns
    """
    Ts = np.asarray(list(Ts), dtype=np.int64)
    horizon = engine.context.get_out_times()
    if horizon < Ts.max():
        raise ValueError(
            f"engine horizon {horizon} shorter than max maturity {Ts.max()}"
        )
    dlnx = series.dlnx if isinstance(series, PriceData) else np.asarray(series)
    dlnx = dim_bct(dlnx)[0, 0]  # single-channel series

    # every (context, future) pair fully inside the series
    n_total = dlnx.shape[-1]
    ctx_win = windows(dlnx, w=w + int(Ts.max()), s=stride)
    contexts = ctx_win[:, :w]
    futures = ctx_win[:, w:]
    if dates is not None:
        dates = np.asarray(dates)[w - 1 : n_total - int(Ts.max()) : stride]

    if n_context_splits is None:
        n_context_splits = max(1, contexts.shape[0] // 64)
    to_predict = lambda x: realized_variance(x[:, :, 0, :], Ts=Ts, vol=False)
    predicted, predicted_std = engine.predict(
        contexts,
        k=k,
        to_predict=to_predict,
        eta=eta,
        proba_name=proba_name,
        n_dataset_splits=n_dataset_splits,
        n_context_splits=n_context_splits,
        method=method,
    )
    realized = np.asarray(realized_variance(futures, Ts=Ts, vol=False))

    return BacktestResult(
        Ts=Ts,
        dates=dates,
        predicted=np.asarray(predicted),
        predicted_std=np.asarray(predicted_std),
        realized=realized,
    )
