"""Training subsystem: losses, GT keypoints, augmentation, train step, loop."""
