from .evaluator import RoDyGSEvaluator  # noqa: F401
from .metrics import VizScoreEvaluator, ms_ssim, ssim_eval  # noqa: F401
from .pose_metrics import PoseEvaluator  # noqa: F401
from .pose_opt import PoseOptimizer  # noqa: F401
