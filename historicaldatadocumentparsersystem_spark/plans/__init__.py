"""Physical-plan introspection helpers (SURVEY.md §4 discipline).

The reference has no optimizer (SURVEY §4.1) — ours is Catalyst, and
these helpers make plan *shape* testable: the flagship must stay
"scan -> one exchange -> MapInPandas", scans must prune columns, small
dimension joins must broadcast. tests/test_plans.py enforces this so a
regression that adds a shuffle or widens a scan fails CI.
"""

from .checks import (count_data_exchanges, count_exchanges,  # noqa: F401
                     has_broadcast_join, physical_plan,
                     scan_read_schemas)
