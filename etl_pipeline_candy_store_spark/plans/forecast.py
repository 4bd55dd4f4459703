"""TS1-TS4 — per-series forecasting as a grouped pandas operator.

Reference behavior (src/time_series.py): fit Prophet per series (sales,
profit), compute in-sample MAE/MSE, predict the next k days. Two bugs we
do NOT inherit by default (SURVEY §2.10 TS1, §4.2): the reference anchors
synthetic dates at *run time* (``pd.Timestamp.today()``,
src/time_series.py:21) making output non-reproducible, and runs all model
compute on the driver. Here each series is one ``applyInPandas`` group
(parallel across metrics; at scale, across thousands of per-key series),
anchored at the series' actual last business date; ``anchor="today"``
reproduces the reference bug for parity runs.

Prophet is not installed in this container: the fitter tries to import it
and falls back to a deterministic OLS linear-trend forecaster (same
operator shape, reproducible numbers).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FORECAST_LONG = StructType(
    [
        StructField("metric", StringType(), False),
        StructField("step", IntegerType(), False),
        StructField("date", DateType(), False),
        StructField("yhat", DoubleType(), False),
        StructField("mae", DoubleType(), False),
        StructField("mse", DoubleType(), False),
    ]
)


def _fit_predict_numpy(y: np.ndarray, periods: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic OLS linear trend: yhat(t) = a + b·t. Returns
    (in-sample fitted values, next-`periods` forecasts)."""
    n = len(y)
    t = np.arange(n, dtype=np.float64)
    if n == 1:
        fitted = y.astype(np.float64)
        future = np.repeat(float(y[0]), periods)
        return fitted, future
    b, a = np.polyfit(t, y.astype(np.float64), 1)
    fitted = a + b * t
    future = a + b * np.arange(n, n + periods, dtype=np.float64)
    return fitted, future


def _fit_predict_prophet(
    dates: pd.Series, y: np.ndarray, periods: int
) -> tuple[np.ndarray, np.ndarray] | None:
    try:
        from prophet import Prophet  # optional; absent in this container
    except ImportError:
        return None
    m = Prophet()
    m.fit(pd.DataFrame({"ds": pd.to_datetime(dates), "y": y}))
    future = m.make_future_dataframe(periods=periods)
    pred = m.predict(future)["yhat"].to_numpy()
    return pred[: len(y)], pred[len(y):]


def forecast_metrics(
    long_df: DataFrame,
    periods: int = 1,
    anchor: str = "last_date",
) -> DataFrame:
    """Input: long-format (metric: str, date: date, value: double).
    Output: FORECAST_LONG — per metric, `periods` future rows with the
    in-sample MAE/MSE (TS3) repeated on each row.

    anchor="today" reproduces the reference's run-date anchoring bug
    (src/time_series.py:21) for bug-parity experiments.
    """

    def _one_metric(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("date").reset_index(drop=True)
        y = pdf["value"].to_numpy(dtype=np.float64)
        res = _fit_predict_prophet(pdf["date"], y, periods)
        if res is None:
            res = _fit_predict_numpy(y, periods)
        fitted, future = res
        mae = float(np.mean(np.abs(y - fitted)))
        mse = float(np.mean((y - fitted) ** 2))
        if anchor == "today":
            last = _dt.date.today()
        else:
            last = pdf["date"].iloc[-1]
        return pd.DataFrame(
            {
                "metric": pdf["metric"].iloc[0],
                "step": np.arange(1, periods + 1, dtype=np.int32),
                "date": [last + _dt.timedelta(days=i) for i in range(1, periods + 1)],
                "yhat": future,
                "mae": mae,
                "mse": mse,
            }
        )

    return long_df.groupBy("metric").applyInPandas(_one_metric, schema=FORECAST_LONG)


def forecast_sales_profit(daily_summary: DataFrame, periods: int = 1) -> DataFrame:
    """TS4 — reference forecast_sales_and_profits
    (src/data_processor.py:73-95): melt daily_summary to long format,
    forecast both metrics, pivot back to (date, forecasted_sales,
    forecasted_profit) with HALF_UP 2-decimal rounding (F2 parity,
    src/data_processor.py:224-228)."""
    long_df = daily_summary.select(
        "date",
        F.expr(
            "stack(2, 'sales', CAST(total_sales AS DOUBLE),"
            " 'profit', CAST(total_profit AS DOUBLE)) AS (metric, value)"
        ),
    )
    fc = forecast_metrics(long_df, periods=periods)
    return (
        fc.groupBy("date")
        .pivot("metric", ["sales", "profit"])
        .agg(F.first("yhat"))
        .select(
            "date",
            F.round(F.col("sales"), 2).alias("forecasted_sales"),
            F.round(F.col("profit"), 2).alias("forecasted_profit"),
        )
        .orderBy("date")
    )
