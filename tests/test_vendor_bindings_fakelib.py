"""Drive the vendor ctypes bindings against fake C vendor libraries
compiled at test time: validates struct layouts, argtype marshaling and
callback round trips in real compiled code, without SDR hardware."""

import ctypes
import shutil
import subprocess

import numpy as np
import pytest

from urh_tpu.dev import vendor_libs as v

pytestmark = pytest.mark.skipif(shutil.which("gcc") is None,
                                reason="gcc not available")

AIRSPY_C = r"""
#include <stdint.h>
struct airspy_transfer {
    void* device; void* ctx; void* samples;
    int sample_count; uint64_t dropped_samples; int sample_type;
};
typedef int (*cb_fn)(struct airspy_transfer*);
static int sample_type_set = -1;
int airspy_open(void** dev) { *dev = (void*)0x1234; return 0; }
int airspy_close(void* dev) { return 0; }
int airspy_set_sample_type(void* dev, int t) { sample_type_set = t; return 0; }
int airspy_set_freq(void* dev, uint32_t f) { return f == 433920000u ? 0 : -1; }
int airspy_set_samplerate(void* dev, uint32_t r) { return 0; }
int airspy_set_vga_gain(void* dev, uint8_t g) { return 0; }
int airspy_set_mixer_gain(void* dev, uint8_t g) { return 0; }
int airspy_set_lna_gain(void* dev, uint8_t g) { return 0; }
int airspy_start_rx(void* dev, cb_fn cb, void* ctx) {
    float samples[8] = {0.1f,-0.1f,0.2f,-0.2f,0.3f,-0.3f,0.4f,-0.4f};
    struct airspy_transfer t = {dev, ctx, samples, 4, 0, sample_type_set};
    return cb(&t);
}
int airspy_stop_rx(void* dev) { return 0; }
"""

LIME_C = r"""
#include <stdint.h>
#include <stdbool.h>
#include <string.h>
typedef struct {
    size_t handle; bool isTx; uint32_t channel; uint32_t fifoSize;
    float throughputVsLatency; int dataFmt;
} lms_stream_t;
typedef char lms_info_str_t[256];
int LMS_GetDeviceList(lms_info_str_t* list) {
    strcpy(list[0], "LimeSDR Mini, serial=1A2B"); return 1;
}
int LMS_Open(void** dev, const char* info, void* args) { *dev = (void*)0x42; return 0; }
int LMS_Init(void* dev) { return 0; }
int LMS_Close(void* dev) { return 0; }
int LMS_EnableChannel(void* dev, bool tx, size_t ch, bool en) { return 0; }
int LMS_SetLOFrequency(void* dev, bool tx, size_t ch, double f) {
    return f == 433920000.0 ? 0 : -1;
}
int LMS_SetSampleRate(void* dev, double r, size_t ov) { return 0; }
int LMS_SetLPFBW(void* dev, bool tx, size_t ch, double bw) { return 0; }
int LMS_SetNormalizedGain(void* dev, bool tx, size_t ch, double g) {
    return (g >= 0 && g <= 1) ? 0 : -1;
}
int LMS_SetupStream(void* dev, lms_stream_t* s) {
    if (s->isTx != false) return -1;
    if (s->channel != 0) return -2;
    if (s->dataFmt != 0) return -3;
    if (s->throughputVsLatency < 0.49f || s->throughputVsLatency > 0.51f) return -4;
    s->handle = 777; return 0;
}
int LMS_StartStream(lms_stream_t* s) { return s->handle == 777 ? 0 : -1; }
int LMS_RecvStream(lms_stream_t* s, void* samples, size_t count, void* meta,
                   unsigned timeout) {
    float* f = (float*)samples;
    for (int i = 0; i < 6; i++) f[i] = (float)(i + 1);
    return 3;
}
int LMS_StopStream(lms_stream_t* s) { return 0; }
int LMS_DestroyStream(void* dev, lms_stream_t* s) { return 0; }
"""

BLADERF_C = r"""
#include <stdint.h>
#include <stdbool.h>
int bladerf_open(void** dev, const char* ident) { *dev = (void*)0x99; return 0; }
void bladerf_close(void* dev) {}
int bladerf_enable_module(void* dev, int ch, bool en) { return 0; }
int bladerf_set_frequency(void* dev, int ch, uint64_t f) {
    /* channel RX0 == 0 and 64-bit frequency must arrive intact */
    if (ch != 0) return -10;
    return f == 5800000000ull ? 0 : -1;
}
int bladerf_set_sample_rate(void* dev, int ch, uint32_t r, uint32_t* actual) {
    *actual = r; return 0;
}
int bladerf_set_bandwidth(void* dev, int ch, uint32_t bw, uint32_t* actual) {
    *actual = bw; return 0;
}
int bladerf_set_gain(void* dev, int ch, int g) { return 0; }
int bladerf_sync_config(void* dev, int layout, int fmt, unsigned nb, unsigned bs,
                        unsigned nt, unsigned timeout) {
    return (layout == 0 && fmt == 0) ? 0 : -1;
}
int bladerf_sync_rx(void* dev, void* samples, unsigned n, void* meta, unsigned t) {
    int16_t* s = (int16_t*)samples;
    for (unsigned i = 0; i < 2 * n && i < 8; i++) s[i] = (int16_t)(i + 1);
    return 0;
}
"""


def build(tmp_path, name, source):
    src = tmp_path / (name + ".c")
    so = tmp_path / ("lib" + name + ".so")
    src.write_text(source)
    subprocess.check_call(["gcc", "-shared", "-fPIC", "-o", str(so), str(src)])
    return str(so)


def test_airspy_binding(tmp_path):
    lib = v.AirSpyLib()
    lib.lib = ctypes.CDLL(build(tmp_path, "airspy", AIRSPY_C))
    assert lib.setup()
    assert lib.set_center_freq(433.92e6) == 0
    assert lib.set_center_freq(100e6) != 0  # fake lib rejects other values

    received = []
    assert lib.start_rx(received.append) == 0
    assert len(received) == 1
    np.testing.assert_allclose(
        np.frombuffer(received[0], dtype=np.float32),
        [0.1, -0.1, 0.2, -0.2, 0.3, -0.3, 0.4, -0.4], atol=1e-7)
    lib.stop_rx()
    lib.close()


def test_limesdr_binding(tmp_path):
    lib = v.LimeSDRLib.__new__(v.LimeSDRLib)
    lib.lib = ctypes.CDLL(build(tmp_path, "LimeFake", LIME_C))
    lib.dev = ctypes.c_void_p()
    lib.stream = v.LmsStream()
    lib.is_tx = False
    lib.channel = 0
    lib.lib.LMS_SetLOFrequency.argtypes = [ctypes.c_void_p, ctypes.c_bool,
                                           ctypes.c_size_t, ctypes.c_double]
    lib.lib.LMS_SetSampleRate.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                          ctypes.c_size_t]
    lib.lib.LMS_SetNormalizedGain.argtypes = [ctypes.c_void_p, ctypes.c_bool,
                                              ctypes.c_size_t, ctypes.c_double]
    lib.lib.LMS_SetLPFBW.argtypes = [ctypes.c_void_p, ctypes.c_bool,
                                     ctypes.c_size_t, ctypes.c_double]

    assert lib.setup("1A2B")
    assert lib.set_center_freq(433.92e6) == 0
    assert lib.set_normalized_gain(0.5) == 0
    assert lib.set_normalized_gain(5) != 0
    # C side validates every lms_stream_t field offset
    assert lib.setup_stream()
    data = np.frombuffer(lib.receive_sync(), dtype=np.float32)
    np.testing.assert_array_equal(data, [1, 2, 3, 4, 5, 6])
    lib.stop_stream()
    lib.close()


def test_bladerf_binding(tmp_path):
    lib = v.BladeRFLib.__new__(v.BladeRFLib)
    lib.lib = ctypes.CDLL(build(tmp_path, "bladeRFfake", BLADERF_C))
    lib.dev = ctypes.c_void_p()
    lib.is_tx = False
    lib.lib.bladerf_open.argtypes = [ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p]
    lib.lib.bladerf_set_frequency.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                              ctypes.c_uint64]

    assert lib.setup()
    # 5.8 GHz does not fit 32 bits: catches a c_uint32 mistake
    assert lib.set_center_freq(5.8e9) == 0
    assert lib.set_center_freq(433.92e6) != 0
    assert lib.set_sample_rate(2e6) == 0
    data = np.frombuffer(lib.receive_sync(), dtype=np.int16)
    np.testing.assert_array_equal(data[:8], [1, 2, 3, 4, 5, 6, 7, 8])
    lib.close()
