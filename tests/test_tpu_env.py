"""Environment check (analogue of reference tests/test_gpu_tensorflow.py:10-14,
which asserted a GPU was visible to TF): verifies a TPU is reachable, skips
when running on the CPU-only test backend."""
import unittest

import jax


class TestTPUAvailable(unittest.TestCase):
    def test_tpu_device_present(self):
        try:
            devices = jax.devices("tpu")
        except RuntimeError:
            self.skipTest("no TPU platform in this process (CPU test backend)")
        self.assertGreater(len(devices), 0)
