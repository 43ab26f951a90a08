"""Native (C++) runtime components: GIL-free IO data plane.

The DSP math runs on TPU through JAX/XLA/Pallas; the host-side runtime
around it — sample transport, ring buffering — has native C++
implementations here, mirroring the reference's use of native code for
its IO layer (SURVEY.md section 2.1).  Builds on demand with g++ and
binds through ctypes (no pybind11 dependency).
"""

from urh_tpu.native.build import get_library, is_available
from urh_tpu.native.ringbuffer import NativeRingBuffer
from urh_tpu.native.net_io import NativeSampleReceiver, native_send_samples

__all__ = ["get_library", "is_available", "NativeRingBuffer",
           "NativeSampleReceiver", "native_send_samples"]
