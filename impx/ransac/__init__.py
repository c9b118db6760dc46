from impx.ransac.eight_point import essential_from_points
from impx.ransac.ransac import estimate_essential_ransac
from impx.ransac.pose_solver import estimate_pose_jax, estimate_pose_cv2, estimate_pose
