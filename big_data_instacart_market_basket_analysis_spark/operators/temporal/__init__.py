"""[EXT] Temporal join operators over ``events`` — as-of join, bucketed
range join, and distribution stats (exact quantiles, approx distinct).

The reference has no time-series surface at all (its events are
implicit in order_number ordering, SURVEY.md §2 O2/A11); these are the
operators a large-scale event pipeline needs and Spark lacks as
built-ins. Both joins are expressed as compositions of existing
DataFrame ops (the (a) strategy from the build rules) — no UDFs, no
mapPartitions:

- **As-of join**: union-tag-window. Tag both streams, sort each user's
  timeline once, carry the reference stream's latest values forward
  with ``last(..., ignorenulls=True)``. ONE shuffle on user_id total —
  vs the naive inequality join which is O(n^2) per user and unrunnable
  at scale. This is the standard scalable as-of pattern (same shape
  kdb/Flink temporal joins lower to).
- **Range join**: time-bucketed equi-join. Replicate the probe side
  into the 3 adjacent buckets of width == the range, equi-join on
  (user_id, bucket), then filter the exact predicate. Candidate pairs
  are bounded per bucket instead of per user — the plan survives a
  hot user with a long history, and AQE can split any residual hot
  bucket. The oracle replays the semantics as a plain inequality join
  (fine at fixture scale, which is the point of the differential).

Determinism rules: every output timestamp is epoch millis (bigint);
tie-breaks are total (ts, tag, event_id); double aggregates follow the
repo float rule (round(4) both sides, or raw pass-through of stored
values).


Package form of the former single-module ``temporal.py`` (split r9, r8 verdict task 2): thematic submodules, star-re-exported here so every existing call site (``temporal.<name>``) keeps working unchanged.
"""

from __future__ import annotations

from .joins import *  # noqa: F401,F403
from .calendar import *  # noqa: F401,F403
from .distrib import *  # noqa: F401,F403
from .spc import *  # noqa: F401,F403
from .twosample import *  # noqa: F401,F403
from .causal import *  # noqa: F401,F403
from .sequence import *  # noqa: F401,F403
from .fits import *  # noqa: F401,F403
from .survival import *  # noqa: F401,F403
from .econ import *  # noqa: F401,F403

# underscore names with package-internal consumers (streaming/events.py
# KMV twin) — star-import skips them, so re-export explicitly.
from .distrib import _KMV_DENOM  # noqa: F401
