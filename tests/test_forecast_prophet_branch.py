"""TS1 Prophet-branch wiring (reference src/time_series.py:16-43).

Prophet is absent in this container, so the operator normally takes the
deterministic OLS fallback (covered elsewhere). These tests inject a
fake ``prophet`` module to execute the import-gated branch itself
(plans/forecast.py:_fit_predict_prophet) and pin its contract: the fit
frame has Prophet's (ds, y) columns with the series' real dates, the
future frame extends by exactly ``periods``, and the prediction splits
into (in-sample fitted, out-of-sample future) at len(y).

Driver-side unit tests by design: inside Spark the import runs in the
Python WORKER process, where a driver-side sys.modules patch does not
exist — the Spark-side operator shape is what test_candy_pipeline's
forecast tests cover.
"""

from __future__ import annotations

import datetime as dt
import sys
import types

import numpy as np
import pandas as pd
import pytest

from etl_pipeline_candy_store_spark.plans.forecast import _fit_predict_prophet


class _FakeProphet:
    instances: list["_FakeProphet"] = []

    def __init__(self):
        self.fit_df = None
        self.future_periods = None
        _FakeProphet.instances.append(self)

    def fit(self, df):
        self.fit_df = df
        return self

    def make_future_dataframe(self, periods):
        self.future_periods = periods
        last = self.fit_df["ds"].iloc[-1]
        ds = list(self.fit_df["ds"]) + [
            last + pd.Timedelta(days=i) for i in range(1, periods + 1)
        ]
        return pd.DataFrame({"ds": ds})

    def predict(self, future):
        # deterministic, position-coded so the caller's split is checkable
        return pd.DataFrame({"yhat": np.arange(len(future), dtype=np.float64) * 10.0})


@pytest.fixture()
def fake_prophet(monkeypatch):
    _FakeProphet.instances = []
    mod = types.ModuleType("prophet")
    mod.Prophet = _FakeProphet
    monkeypatch.setitem(sys.modules, "prophet", mod)
    return _FakeProphet


def _series(n=5):
    dates = pd.Series([dt.date(2024, 3, 1) + dt.timedelta(days=i) for i in range(n)])
    y = np.array([10.0, 12.0, 11.0, 15.0, 14.0][:n])
    return dates, y


def test_prophet_branch_wires_dates_and_periods(fake_prophet):
    dates, y = _series()
    res = _fit_predict_prophet(dates, y, periods=3)
    assert res is not None
    fitted, future = res
    # split at len(y): in-sample 5 rows, forecast 3 rows
    assert list(fitted) == [0.0, 10.0, 20.0, 30.0, 40.0]
    assert list(future) == [50.0, 60.0, 70.0]
    (m,) = fake_prophet.instances
    # fit frame: Prophet's (ds, y) contract with the REAL series dates
    assert list(m.fit_df.columns) == ["ds", "y"]
    assert m.fit_df["ds"].tolist() == pd.to_datetime(dates).tolist()
    assert m.fit_df["y"].tolist() == y.tolist()
    assert m.future_periods == 3


def test_prophet_branch_single_period(fake_prophet):
    dates, y = _series(2)
    fitted, future = _fit_predict_prophet(dates, y, periods=1)
    assert len(fitted) == 2 and len(future) == 1


def test_without_prophet_returns_none(monkeypatch):
    """Import failure → None, which routes the caller to the OLS
    fallback (the path every in-container run takes)."""
    monkeypatch.setitem(sys.modules, "prophet", None)  # import raises
    dates, y = _series()
    assert _fit_predict_prophet(dates, y, periods=2) is None
