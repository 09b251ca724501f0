"""Training-image sampling with an error buffer.

Re-creation of OmniRe's importance sampler
(pixel_source.py propose_training_image:909-936 + buffer update :948-983):
each train image carries a smoothed error score; images are drawn from a
multinomial over scores mixed with a uniform floor, and scores are updated
from the rendered loss map after each visit.
"""
from __future__ import annotations

import numpy as np


class ErrorBufferSampler:
    def __init__(self, train_indices: np.ndarray, uniform_frac: float = 0.5,
                 ema: float = 0.8, seed: int = 0):
        self.indices = np.asarray(train_indices)
        self.scores = np.ones(len(self.indices), np.float64)
        self.uniform_frac = float(uniform_frac)
        self.ema = float(ema)
        self.rng = np.random.RandomState(seed)
        self._pos = {int(v): i for i, v in enumerate(self.indices)}

    def sample(self) -> int:
        if self.rng.rand() < self.uniform_frac:
            return int(self.rng.choice(self.indices))
        p = self.scores / self.scores.sum()
        return int(self.rng.choice(self.indices, p=p))

    def update(self, index: int, error: float) -> None:
        i = self._pos[int(index)]
        self.scores[i] = (self.ema * self.scores[i]
                          + (1.0 - self.ema) * float(error))

    def state(self) -> np.ndarray:
        return self.scores.copy()

    def snapshot(self) -> dict:
        """Full sampler state (scores + MT19937 RNG) as arrays, so a
        resumed run replays the exact same image sequence (the reference
        caches its error buffer across restarts, train.py:306-334)."""
        st = self.rng.get_state()
        return dict(scores=self.scores.copy(),
                    mt=np.asarray(st[1], np.uint32),
                    mt_pos=np.int64(st[2]),
                    has_gauss=np.int64(st[3]),
                    cached=np.float64(st[4]))

    def restore(self, snap: dict) -> None:
        self.scores = np.asarray(snap["scores"], np.float64).copy()
        self.rng.set_state(("MT19937", np.asarray(snap["mt"], np.uint32),
                            int(snap["mt_pos"]), int(snap["has_gauss"]),
                            float(snap["cached"])))
