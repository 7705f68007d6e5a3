"""Chi-squared gating table.

The reference builds a 0.05-quantile chi-squared table at initialize time via
Boost.Math (/root/reference/include/msckf_mono/msckf.h:89-95) and indexes it as
``chi_squared_test_table[dof + 1]`` in the gating test (msckf.h:1117). Because
``table[i-1] = quantile(chi2(i), 0.05)``, that lookup actually evaluates the
quantile at ``dof + 2`` degrees of freedom — an off-by-one quirk of the
reference. We precompute the table once with scipy at trace time (it enters the
jitted program as a constant) and expose the quirk as a flag so both behaviors
are available.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.stats import chi2 as _chi2

MAX_DOF = 256

# _TABLE[k] = 0.05-quantile of a chi2 with k dof; k=0 entry is a placeholder.
_TABLE = np.concatenate([[0.0], _chi2.ppf(0.05, np.arange(1, MAX_DOF + 1))]).astype(np.float64)


def chi2_gate_table(dtype=jnp.float32):
    """The quantile table as a jnp constant, indexable by degrees of freedom."""
    return jnp.asarray(_TABLE, dtype=dtype)


def gate_threshold(dof, *, reproduce_offbyone: bool = True, dtype=jnp.float32):
    """Gating threshold for the Mahalanobis test.

    With ``reproduce_offbyone`` (default) this matches the reference's
    ``table[dof+1]`` lookup, i.e. the 0.05 quantile at ``dof+2`` dof.
    """
    table = chi2_gate_table(dtype)
    idx = dof + 2 if reproduce_offbyone is True else dof
    if not isinstance(idx, (int, np.integer)):
        idx = jnp.clip(idx, 1, MAX_DOF)
    return table[idx]
