from .regression import (
    hash_split_flag,
    price_regression_exact,
    price_regression_metrics,
    train_price_model,
    train_price_model_gbt,
)

__all__ = [
    "hash_split_flag",
    "price_regression_exact",
    "price_regression_metrics",
    "train_price_model",
    "train_price_model_gbt",
]
