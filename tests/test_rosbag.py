"""Rosbag reader: synthesize a v2.0 bag in-memory, read it back."""

import struct

import numpy as np

from legkilo_tpu.io import rosbag as rb


def _header(fields: dict) -> bytes:
    out = b""
    for name, value in fields.items():
        field = name + b"=" + value
        out += struct.pack("<I", len(field)) + field
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(stamp: float) -> bytes:
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    return struct.pack("<III", 0, secs, nsecs) + _string("frame")


def serialize_imu(stamp, acc, gyr) -> bytes:
    out = _ros_header(stamp)
    out += struct.pack("<4d", 0, 0, 0, 1)
    out += struct.pack("<9d", *np.zeros(9))
    out += struct.pack("<3d", *gyr)
    out += struct.pack("<9d", *np.zeros(9))
    out += struct.pack("<3d", *acc)
    out += struct.pack("<9d", *np.zeros(9))
    return out


def serialize_pointcloud2(stamp, pts, times) -> bytes:
    """Velodyne-style cloud: x,y,z,intensity f32 + time f32 + ring u16."""
    n = len(pts)
    point_step = 22
    payload = bytearray(n * point_step)
    for i in range(n):
        struct.pack_into(
            "<5fH", payload, i * point_step,
            pts[i, 0], pts[i, 1], pts[i, 2], 1.0, times[i], 0,
        )
    out = _ros_header(stamp)
    out += struct.pack("<II", 1, n)  # height, width
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
              ("intensity", 12, 7, 1), ("time", 16, 7, 1), ("ring", 20, 4, 1)]
    out += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        out += _string(name) + struct.pack("<IBI", off, dt, cnt)
    out += struct.pack("<B", 0)  # is_bigendian
    out += struct.pack("<II", point_step, point_step * n)
    out += struct.pack("<I", len(payload)) + bytes(payload)
    out += struct.pack("<B", 1)  # is_dense
    return out


def serialize_high_state(stamp, acc, gyr, q, dq, foot_force) -> bytes:
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    out = struct.pack("<II", secs, nsecs)
    out += bytes(2) + bytes(1) + bytes(1)          # head, levelFlag, frameReserve
    out += struct.pack("<2I2IH", 0, 0, 0, 0, 0)    # SN, version, bandWidth
    out += struct.pack("<13f", 0, 0, 0, 1, *gyr, *acc, 0, 0, 0)
    out += struct.pack("<b", 0)                     # imu temperature
    for i in range(20):
        out += struct.pack("<B7fb2I", 0, q[i], dq[i], 0, 0, 0, 0, 0, 0, 0, 0)
    out += bytes(rb._BMS_SIZE)
    out += struct.pack("<4h", *foot_force)
    out += bytes(64)  # trailing fields we don't parse
    return out


def write_bag(path, messages):
    """messages: list of (topic, msg_type, stamp, raw)."""
    conns = {}
    chunk = b""
    for topic, msg_type, stamp, raw in messages:
        if topic not in conns:
            cid = len(conns)
            conns[topic] = cid
            conn_data = _header({b"topic": topic.encode(),
                                 b"type": msg_type.encode(),
                                 b"md5sum": b"0" * 32,
                                 b"message_definition": b""})
            chunk += _record(
                {b"op": b"\x07", b"conn": struct.pack("<I", cid),
                 b"topic": topic.encode()},
                conn_data,
            )
        secs = int(stamp)
        nsecs = int(round((stamp - secs) * 1e9))
        chunk += _record(
            {b"op": b"\x02", b"conn": struct.pack("<I", conns[topic]),
             b"time": struct.pack("<II", secs, nsecs)},
            raw,
        )
    with open(path, "wb") as f:
        f.write(rb.BagReader.MAGIC)
        f.write(_record({b"op": b"\x03", b"index_pos": struct.pack("<Q", 0),
                         b"conn_count": struct.pack("<I", len(conns)),
                         b"chunk_count": struct.pack("<I", 1)}, b" " * 128))
        f.write(_record({b"op": b"\x05", b"compression": b"none",
                         b"size": struct.pack("<I", len(chunk))}, chunk))


def test_bag_roundtrip(tmp_path, rng):
    pts = rng.uniform(-5, 5, size=(40, 3)).astype(np.float32)
    times = np.linspace(0, 0.1, 40).astype(np.float32)
    acc = np.array([0.1, 0.2, 9.8])
    gyr = np.array([0.01, -0.02, 0.03])
    q = rng.normal(size=20)
    dq = rng.normal(size=20)
    ff = np.array([250, 100, 240, 90], dtype=np.int16)

    path = str(tmp_path / "test.bag")
    write_bag(path, [
        ("/imu_raw", "sensor_msgs/Imu", 10.0, serialize_imu(10.0, acc, gyr)),
        ("/points_raw", "sensor_msgs/PointCloud2", 10.05,
         serialize_pointcloud2(10.05, pts, times)),
        ("/high_state", "unitree_legged_msgs/HighState", 10.1,
         serialize_high_state(10.1, acc, gyr, q, dq, ff)),
    ])

    with rb.BagReader(path) as reader:
        msgs = list(reader.messages())
    assert [m.topic for m in msgs] == ["/imu_raw", "/points_raw", "/high_state"]

    imu = rb.parse_imu(msgs[0].raw)
    np.testing.assert_allclose(imu.linear_acceleration, acc)
    np.testing.assert_allclose(imu.angular_velocity, gyr)
    assert abs(imu.stamp - 10.0) < 1e-6

    pc = rb.parse_pointcloud2(msgs[1].raw)
    arr = pc.as_struct_array()
    np.testing.assert_allclose(
        np.stack([arr["x"], arr["y"], arr["z"]], axis=-1), pts, atol=1e-6
    )
    np.testing.assert_allclose(arr["time"], times, atol=1e-7)
    assert abs(pc.stamp - 10.05) < 1e-6

    hs = rb.parse_high_state(msgs[2].raw)
    np.testing.assert_allclose(hs.accelerometer, acc, atol=1e-6)
    np.testing.assert_allclose(hs.gyroscope, gyr, atol=1e-6)
    np.testing.assert_allclose(hs.motor_q, q, atol=1e-6)
    np.testing.assert_allclose(hs.motor_dq, dq, atol=1e-6)
    np.testing.assert_allclose(hs.foot_force, ff)


def test_bag_topic_filter(tmp_path, rng):
    path = str(tmp_path / "t.bag")
    write_bag(path, [
        ("/a", "sensor_msgs/Imu", 1.0, serialize_imu(1.0, np.zeros(3), np.zeros(3))),
        ("/b", "sensor_msgs/Imu", 2.0, serialize_imu(2.0, np.zeros(3), np.zeros(3))),
    ])
    with rb.BagReader(path) as reader:
        msgs = list(reader.messages(["/b"]))
    assert len(msgs) == 1 and msgs[0].topic == "/b"


def test_bag_decode_through_lidar_module(tmp_path, rng):
    from legkilo_tpu.config import LidarConfig
    from legkilo_tpu.models import lidar as lidar_mod

    pts = rng.uniform(-5, 5, size=(30, 3)).astype(np.float32)
    # End-stamped scan (legkilo convention): offsets negative.
    times = np.linspace(-0.1, 0.0, 30).astype(np.float32)
    raw = serialize_pointcloud2(20.0, pts, times)
    scan = lidar_mod.decode(rb.parse_pointcloud2(raw), LidarConfig(lidar_type=1))
    assert abs(scan.begin_time - 19.9) < 1e-6
    assert abs(scan.end_time - 20.0) < 1e-6
    np.testing.assert_allclose(scan.time_offset, times + 0.1, atol=1e-6)
