from emfusion_tpu.eval.ate import (
    align_horn, evaluate_ate, evaluate_rpe, load_trajectory,
)

__all__ = ["align_horn", "evaluate_ate", "evaluate_rpe", "load_trajectory"]
