"""Class-prior handling for AM score debiasing.

Rebuilds builder.py:16-27 (read_prior) and the -log(prior) output bias
(builder.py:83-88): the prior text file's first entry is dropped, zero
entries are smoothed to the minimum non-zero value, and the vector is
renormalized.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def read_prior(prior_file: str,
               minimum_prior: Optional[float] = None) -> np.ndarray:
    prior = np.loadtxt(prior_file)[1:]
    non_zero_min = prior[prior != 0].min()
    prior[prior == 0] = non_zero_min
    prior = prior / prior.sum()
    if minimum_prior is not None:
        prior = np.maximum(prior, minimum_prior)
    return prior
