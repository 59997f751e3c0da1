"""Classical baseline: band-pass → CSP → scaler → SVM / shrinkage-LDA.

Capability parity with the reference's CSP+SVM notebook baseline
(``notebooks/svm_baseline.ipynb`` cells 5/9/15: MNE 4-40 Hz FIR
band-pass → ``CSP(n_components=8, log=True)`` → StandardScaler →
RBF-SVM with ``C=1, gamma='scale', class_weight='balanced'``), plus the
filterbank-CSP → shrinkage-LDA variant of BASELINE.json config #2.

TPU split of labor: filtering + CSP + feature extraction run as jitted
batched jax ops (``ops.filters``, ``ops.csp``); only the final
small-sample convex solver (SVM/LDA on ~300 x 8-40 features) runs on
host sklearn — that part is microseconds and not a throughput concern.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.csp import CSPModel, csp_fit, csp_transform
from ..ops.filters import bandpass_filter


@dataclass
class CSPClassifierPipeline:
    """fit/predict pipeline: band-pass (or filterbank) → CSP → classifier.

    ``classifier``: 'svm' (RBF, reference-parity hyperparameters) or
    'lda' (eigen-solver shrinkage LDA).
    """

    n_classes: int = 5
    sfreq: float = 250.0
    l_freq: Optional[float] = 4.0
    h_freq: Optional[float] = 40.0
    filter_method: str = "fir"  # reference uses MNE FIR filtering
    bands: Optional[Sequence[Tuple[float, float]]] = None  # filterbank mode
    n_components: int = 10
    classifier: str = "svm"
    csp_models: List[CSPModel] = field(default_factory=list)
    clf: object = None

    # ------------------------------------------------------------------
    def _filter(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        if self.bands:
            return [
                bandpass_filter(x, self.sfreq, lo, hi, method=self.filter_method)
                for lo, hi in self.bands
            ]
        return [
            bandpass_filter(x, self.sfreq, self.l_freq, self.h_freq, method=self.filter_method)
        ]

    def _features(self, x: jnp.ndarray, fit: bool, y: Optional[jnp.ndarray] = None) -> np.ndarray:
        banded = self._filter(jnp.asarray(x))
        feats = []
        for bi, xb in enumerate(banded):
            if fit:
                model = csp_fit(xb, jnp.asarray(y), self.n_classes, self.n_components)
                self.csp_models.append(model)
            feats.append(np.asarray(csp_transform(xb, self.csp_models[bi])))
        return np.concatenate(feats, axis=-1)

    # ------------------------------------------------------------------
    def fit(self, x: np.ndarray, y: np.ndarray) -> "CSPClassifierPipeline":
        self.csp_models = []
        feats = self._features(x, fit=True, y=y)
        if self.classifier == "svm":
            from sklearn.svm import SVC

            self.clf = SVC(C=1.0, gamma="scale", kernel="rbf", class_weight="balanced")
        elif self.classifier == "lda":
            from sklearn.discriminant_analysis import LinearDiscriminantAnalysis

            self.clf = LinearDiscriminantAnalysis(solver="eigen", shrinkage="auto")
        else:
            raise ValueError(f"unknown classifier {self.classifier!r}")
        self.clf.fit(feats, np.asarray(y))
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        if self.clf is None:
            raise RuntimeError("pipeline not fitted")
        return self.clf.predict(self._features(x, fit=False))

    def score(self, x: np.ndarray, y: np.ndarray) -> float:
        return float(np.mean(self.predict(x) == np.asarray(y)))

    # ------------------------------------------------------------------
    def save(self, path: str) -> str:
        import joblib

        joblib.dump(self, path)
        return path

    @staticmethod
    def load(path: str) -> "CSPClassifierPipeline":
        import joblib

        return joblib.load(path)
