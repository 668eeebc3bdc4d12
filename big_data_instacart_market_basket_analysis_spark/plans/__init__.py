from .instacart import (
    EVAL_PRIOR,
    EVAL_TEST,
    EVAL_TRAIN,
    ORACLE_BASE_CTES,
    instacart_tables,
)

__all__ = [
    "EVAL_PRIOR",
    "EVAL_TRAIN",
    "EVAL_TEST",
    "ORACLE_BASE_CTES",
    "instacart_tables",
]
