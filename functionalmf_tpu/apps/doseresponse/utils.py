"""Small app-local helpers (reference doseresponse/utils.py:1-12)."""
from __future__ import annotations

import numpy as np


def load_data_as_pandas(filename):
    import pandas as pd
    return pd.read_csv(filename, header=0)


def flatten(l):
    """Takes a list of lists and flattens it."""
    return [item for sublist in l for item in sublist]


def ilogit(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x)))
