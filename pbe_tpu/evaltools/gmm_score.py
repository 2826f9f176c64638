"""QS (quality score): GMM log-likelihood of Inception pool3 features.

Spec: eval_tool/gmm/gmm_score_coco.py:49-108 — per-image
``gmm.score_samples(features)``, clipped to [0, 300], /300, mean x100.
The reference loads a pretrained sklearn GMM pickle (k=20 fit on COCO2017);
``fit_gmm`` reproduces that fit when reference features are available.
"""
from __future__ import annotations

import pickle
from typing import Callable, Iterable

import numpy as np


def qs_from_loglik(loglik: np.ndarray, min_v: float = 0.0, max_v: float = 300.0) -> float:
    scores = np.clip((np.asarray(loglik) - min_v) / (max_v - min_v), 0.0, 1.0)
    return float(scores.mean() * 100.0)


def gmm_score(
    feature_fn: Callable[[np.ndarray], np.ndarray],
    images01: Iterable[np.ndarray],
    gmm,
    pca=None,
    batch_size: int = 50,
) -> float:
    """images01: iterable of (H,W,3) [0,1] arrays at the extractor's size."""
    images = list(images01)
    logs = []
    for i in range(0, len(images), batch_size):
        feats = np.asarray(feature_fn(np.stack(images[i:i + batch_size])))
        if pca is not None:
            feats = pca.transform(feats)
        logs.append(gmm.score_samples(feats))
    return qs_from_loglik(np.concatenate(logs))


def load_gmm(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def fit_gmm(features: np.ndarray, n_components: int = 20, seed: int = 0):
    from sklearn.mixture import GaussianMixture

    gmm = GaussianMixture(n_components=n_components, random_state=seed)
    gmm.fit(features)
    return gmm
