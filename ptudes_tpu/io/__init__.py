"""Host-side IO: metadata, pcap, packets, ROS bags, pose formats."""
from . import metadata, packets, pcap, poses, rosbag, sources

__all__ = ["metadata", "packets", "pcap", "poses", "rosbag", "sources"]
