from .evaluating import evaluate
