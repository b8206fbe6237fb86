"""Experiment tracking (SURVEY.md §2.7, operators #31/#32).

The reference configures an MLflow tracking URI and (in commented-out
code) logs the embedding model, collection, distance and recall@k
(``Qdrant/mlflow_config.py:5-7``, ``Qdrant/main.py:81-88``).  Tracking
is driver-side and engine-agnostic, so the module is a thin wrapper:
MLflow when importable, else an in-process recorder with the same
surface — pipelines log unconditionally, tests can assert on the
fallback, and installing mlflow changes behavior, not call sites.
"""

from __future__ import annotations

from typing import Any

try:
    import mlflow  # not installed in this container

    _HAVE_MLFLOW = True
except ImportError:
    mlflow = None
    _HAVE_MLFLOW = False

# fallback recorder: list of (kind, key, value) in call order
_LOCAL_LOG: list[tuple[str, str, Any]] = []


def configure(tracking_uri: str | None = None, experiment: str | None = None):
    """Reference twin of ``mlflow_config.py``: set URI + experiment."""
    if _HAVE_MLFLOW:
        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)
        if experiment:
            mlflow.set_experiment(experiment)
    else:
        _LOCAL_LOG.append(("config", "tracking_uri", tracking_uri))
        _LOCAL_LOG.append(("config", "experiment", experiment))


def log_retrieval_run(
    params: dict[str, Any], metrics: dict[str, float]
) -> None:
    """Log one retrieval-evaluation run (the reference's
    ``log_experiment``: embedding model / collection / distance params
    plus recall@k-style metrics, ``Qdrant/main.py:81-88``)."""
    if _HAVE_MLFLOW:
        with mlflow.start_run():
            for k, v in params.items():
                mlflow.log_param(k, v)
            for k, v in metrics.items():
                mlflow.log_metric(k, float(v))
    else:
        for k, v in params.items():
            _LOCAL_LOG.append(("param", k, v))
        for k, v in metrics.items():
            _LOCAL_LOG.append(("metric", k, float(v)))


def local_log() -> list[tuple[str, str, Any]]:
    return list(_LOCAL_LOG)


def clear_local_log() -> None:
    _LOCAL_LOG.clear()
