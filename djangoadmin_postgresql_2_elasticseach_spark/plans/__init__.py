"""Physical-plan helpers: parallelism spreading, explain inspection."""

from .tuning import spread, widen, plan_string, assert_broadcast_join  # noqa: F401
