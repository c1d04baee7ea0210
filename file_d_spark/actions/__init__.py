"""Action plugins (SURVEY.md §2.3) as DataFrame transforms.

Each action compiles its YAML params + optional match gate (do_if /
match_fields) into pure Column expressions applied via the shared
:class:`Action` contract.  Importing this package registers everything.
"""

from file_d_spark.actions.base import Action, REGISTRY, build_action, register

# registration side effects
from file_d_spark.actions import (  # noqa: F401
    basic,
    convert,
    hash_op,
    join_action,
    json_ops,
    mask,
    modify,
    projection,
    split,
    throttle,
)

__all__ = ["Action", "REGISTRY", "build_action", "register"]
