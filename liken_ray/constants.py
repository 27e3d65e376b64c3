"""Engine-wide constants.

Parity notes (reference: VictorAut/liken):
- ``CANONICAL_ID`` label and env override: reference ``src/liken/constants.py:8``.
- ``NA_PLACEHOLDER``: nulls in single-column dedupers are coalesced to the
  literal string ``"na"`` before comparison (reference
  ``src/liken/constants.py:12``, ``src/liken/core/wrapper.py:87-99``).
"""

from __future__ import annotations

import os
from typing import Final

# Cluster-label column materialized into the user's table.
CANONICAL_ID: Final[str] = os.environ.get("CANONICAL_ID", "canonical_id")

# Placeholder string substituted for nulls in single-column deduper inputs.
NA_PLACEHOLDER: Final[str] = "na"

# Internal global row-position column (engine-owned, stripped from outputs).
ROW_ID: Final[str] = "__lkr_row_id__"

# Sequential-API dedupers accumulate under this key (reference
# ``src/liken/constants.py:15``).
SEQUENTIAL_API_DEFAULT_KEY: Final[str] = "_default_"
