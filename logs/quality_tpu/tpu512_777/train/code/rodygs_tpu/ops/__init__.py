from . import covariance, image, knn, quaternion, schedules, sh, transforms  # noqa: F401
