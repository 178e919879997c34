from .textcnn_pallas import textcnn_pool

__all__ = ["textcnn_pool"]
