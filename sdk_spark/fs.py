"""Shared py4j Hadoop FileSystem plumbing.

Checkpoint reclamation (operators/cluster.py) and the ANN index metadata
sidecar (operators/similarity.py) all need driver-side file operations that
work on the CLUSTER filesystem — HDFS/S3A/local, wherever the path actually
lives — not just the driver's local disk.  The fragile py4j surface
(jvm Path + getFileSystem(hadoopConfiguration)) lives here once.
"""

from __future__ import annotations


def hadoop_fs(spark, path: str):
    """(FileSystem, Path) for ``path`` under the session's Hadoop conf."""
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p
