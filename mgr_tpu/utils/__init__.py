"""Small shared utilities: pytree helpers, timers."""

from mgr_tpu.utils.trees import tree_count_params, tree_norm  # noqa: F401
from mgr_tpu.utils.timing import Timer  # noqa: F401
