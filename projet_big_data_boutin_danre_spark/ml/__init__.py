from .regression import price_regression_metrics, train_price_model

__all__ = ["price_regression_metrics", "train_price_model"]
