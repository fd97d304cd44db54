"""Typed pub/sub output surface: queue semantics + message payloads."""

import numpy as np

from mloam_tpu.utils import publisher as P


class TestPublisher:
    def test_publish_subscribe_drain(self):
        pub = P.Publisher()
        got = []
        pub.subscribe("/laser_odom", got.append, queue_size=10)
        for i in range(3):
            pub.publish("/laser_odom", P.OdometryMsg(
                stamp=float(i), frame_id="world",
                t=np.zeros(3), q=np.array([1.0, 0, 0, 0])))
        assert got == []            # queued, not yet delivered
        n = pub.spin_once()
        assert n == 3
        assert [m.stamp for m in got] == [0.0, 1.0, 2.0]
        assert pub.n_published["/laser_odom"] == 3

    def test_bounded_queue_drops_oldest(self):
        pub = P.Publisher()
        got = []
        sub = pub.subscribe("/cloud", got.append, queue_size=2)
        for i in range(5):
            pub.publish("/cloud", i)
        pub.spin_once()
        assert got == [3, 4]        # oldest shed, like the reference's
        assert sub.dropped == 3     # frame-drop counters
        assert pub.dropped("/cloud") == 3

    def test_immediate_mode(self):
        pub = P.Publisher()
        got = []
        pub.subscribe("/x", got.append, spin=True)
        pub.publish("/x", 42)
        assert got == [42]          # no spin needed

    def test_publish_odometry_output(self):
        from mloam_tpu.core.se3 import Pose
        from mloam_tpu.models.pipeline import OdometryOutput
        import jax.numpy as jnp

        pub = P.Publisher()
        odoms, exts = [], []
        pub.subscribe("/laser_odom", odoms.append, spin=True)
        pub.subscribe("/extrinsics", exts.append, spin=True)
        out = OdometryOutput(
            pose=Pose(jnp.array([1.0, 0, 0, 0]), jnp.array([1.0, 2, 3])),
            pose_predict=Pose.identity(),
            extrinsics=Pose(jnp.array([[1.0, 0, 0, 0]]), jnp.zeros((1, 3))),
            ext_mode=0, cost=jnp.asarray(0.0),
            n_corner=jnp.asarray(0), n_surf=jnp.asarray(0),
        )
        P.publish_odometry_output(pub, out, stamp=1.5)
        assert len(odoms) == 1 and len(exts) == 1
        np.testing.assert_allclose(odoms[0].t, [1.0, 2, 3])
        assert exts[0].status == 0
        assert exts[0].q.shape == (1, 4)
