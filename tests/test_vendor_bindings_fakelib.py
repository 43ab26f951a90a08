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


PLUTO_C = r"""
#include <stdint.h>
#include <stdbool.h>
#include <string.h>
#include <stdlib.h>
#include <stdio.h>
#include <sys/types.h>
/* minimal fake libiio: one phy device with the channels the binding uses */
static char last_attr[64], last_channel[64];
static long long last_value;
void* iio_create_default_context(void) { return (void*)0x10; }
void* iio_create_context_from_uri(const char* uri) {
    return strcmp(uri, "ip:192.168.2.1") == 0 ? (void*)0x11 : 0;
}
void iio_context_destroy(void* ctx) {}
void* iio_context_find_device(void* ctx, const char* name) {
    if (!strcmp(name, "ad9361-phy")) return (void*)0x20;
    if (!strcmp(name, "cf-ad9361-lpc")) return (void*)0x21;
    return 0;
}
void* iio_device_find_channel(void* dev, const char* name, bool output) {
    /* altvoltage0 exists only as output; voltage0/1 as input */
    if (!strcmp(name, "altvoltage0")) return output ? (void*)0x30 : 0;
    if (!strcmp(name, "voltage0")) return output ? 0 : (void*)0x31;
    if (!strcmp(name, "voltage1")) return output ? 0 : (void*)0x32;
    return 0;
}
int iio_channel_attr_write_longlong(void* ch, const char* attr, long long v) {
    strncpy(last_attr, attr, 63); last_value = v;
    snprintf(last_channel, 63, "%p", ch);
    return 0;
}
int iio_channel_attr_write(void* ch, const char* attr, const char* v) { return 0; }
void iio_channel_enable(void* ch) {}
void* iio_device_create_buffer(void* dev, size_t n, bool cyclic) {
    int16_t* buf = malloc(4 * n + 16);
    for (size_t i = 0; i < 2 * n && i < 8; i++) buf[i] = (int16_t)(10 + i);
    return buf;
}
ssize_t iio_buffer_refill(void* buf) { return 16; } /* 4 complex int16 samples */
void* iio_buffer_first(void* buf, void* ch) { return buf; }
void iio_buffer_destroy(void* buf) { free(buf); }
/* introspection hooks for the test */
const char* fake_last_attr(void) { return last_attr; }
long long fake_last_value(void) { return last_value; }
"""

UHD_C = r"""
#include <stdint.h>
#include <stdbool.h>
#include <string.h>
typedef struct {
    double target_freq; int rf_freq_policy; double rf_freq;
    int dsp_freq_policy; double dsp_freq; const char* args;
} uhd_tune_request_t;
typedef struct {
    double clipped_rf_freq; double target_rf_freq; double actual_rf_freq;
    double target_dsp_freq; double actual_dsp_freq;
} uhd_tune_result_t;
typedef struct {
    const char* cpu_format; const char* otw_format; const char* args;
    size_t* channel_list; int n_channels;
} uhd_stream_args_t;
typedef struct {
    int stream_mode; size_t num_samps; bool stream_now;
    int64_t time_spec_full_secs; double time_spec_frac_secs;
} uhd_stream_cmd_t;
int uhd_usrp_make(void** h, const char* args) { *h = (void*)0x50; return 0; }
int uhd_usrp_free(void** h) { return 0; }
int uhd_rx_streamer_make(void** h) { *h = (void*)0x51; return 0; }
int uhd_rx_streamer_free(void** h) { return 0; }
int uhd_rx_metadata_make(void** h) { *h = (void*)0x52; return 0; }
int uhd_rx_metadata_free(void** h) { return 0; }
int uhd_usrp_set_rx_rate(void* h, double rate, size_t chan) { return 0; }
int uhd_usrp_set_rx_gain(void* h, double g, size_t chan, const char* name) { return 0; }
int uhd_usrp_set_rx_bandwidth(void* h, double bw, size_t chan) { return 0; }
int uhd_usrp_set_rx_freq(void* h, uhd_tune_request_t* req, size_t chan,
                         uhd_tune_result_t* res) {
    /* validate the python struct layout landed correctly */
    if (req->target_freq != 433920000.0) return -1;
    if (req->rf_freq_policy != 65 || req->dsp_freq_policy != 65) return -2;
    res->actual_rf_freq = req->target_freq;
    return 0;
}
int uhd_usrp_get_rx_stream(void* h, uhd_stream_args_t* args, void* streamer) {
    if (strcmp(args->cpu_format, "fc32")) return -1;
    if (args->n_channels != 1 || args->channel_list[0] != 0) return -2;
    return 0;
}
int uhd_rx_streamer_issue_stream_cmd(void* st, uhd_stream_cmd_t* cmd) {
    return (cmd->stream_mode == 97 || cmd->stream_mode == 111) ? 0 : -1;
}
int uhd_rx_streamer_recv(void* st, void** buffs, size_t n, void** md,
                         double timeout, bool one_packet, size_t* received) {
    float* f = (float*)buffs[0];
    for (int i = 0; i < 4; i++) f[i] = 0.25f * (i + 1);
    *received = 2;
    return 0;
}
"""


def test_plutosdr_binding(tmp_path):
    lib = v.PlutoSDRLib.__new__(v.PlutoSDRLib)
    lib.lib = ctypes.CDLL(build(tmp_path, "iiofake", PLUTO_C))
    lib.ctx = None
    lib.phy = None
    lib.rx_dev = None
    lib.buffer = None
    lib.rx_channels = []
    # apply the same prototypes __init__ would
    lib.lib.iio_create_context_from_uri.restype = ctypes.c_void_p
    lib.lib.iio_create_context_from_uri.argtypes = [ctypes.c_char_p]
    lib.lib.iio_create_default_context.restype = ctypes.c_void_p
    lib.lib.iio_context_find_device.restype = ctypes.c_void_p
    lib.lib.iio_context_find_device.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.lib.iio_device_find_channel.restype = ctypes.c_void_p
    lib.lib.iio_device_find_channel.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                                ctypes.c_bool]
    lib.lib.iio_channel_attr_write_longlong.argtypes = [ctypes.c_void_p,
                                                        ctypes.c_char_p,
                                                        ctypes.c_longlong]
    lib.lib.iio_channel_attr_write.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                               ctypes.c_char_p]
    lib.lib.iio_device_create_buffer.restype = ctypes.c_void_p
    lib.lib.iio_device_create_buffer.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                                 ctypes.c_bool]
    lib.lib.iio_buffer_first.restype = ctypes.c_void_p
    lib.lib.iio_buffer_first.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.lib.iio_channel_enable.argtypes = [ctypes.c_void_p]
    lib.lib.iio_buffer_refill.argtypes = [ctypes.c_void_p]
    lib.lib.iio_buffer_refill.restype = ctypes.c_ssize_t
    lib.lib.iio_buffer_destroy.argtypes = [ctypes.c_void_p]
    lib.lib.iio_context_destroy.argtypes = [ctypes.c_void_p]
    lib.lib.fake_last_attr.restype = ctypes.c_char_p
    lib.lib.fake_last_value.restype = ctypes.c_longlong

    assert lib.setup("ip:192.168.2.1")
    assert lib.set_center_freq(2.4e9) == 0
    # the RX LO write must land on "frequency" with the exact 64-bit value
    assert lib.lib.fake_last_attr() == b"frequency"
    assert lib.lib.fake_last_value() == 2_400_000_000
    assert lib.set_sample_rate(61_440_000) == 0
    assert lib.lib.fake_last_attr() == b"sampling_frequency"

    data = np.frombuffer(lib.receive_sync(), dtype=np.int16)
    np.testing.assert_array_equal(data[:8], [10, 11, 12, 13, 14, 15, 16, 17])
    lib.close()


def test_usrp_binding(tmp_path):
    lib = v.USRPLib.__new__(v.USRPLib)
    lib.lib = ctypes.CDLL(build(tmp_path, "uhdfake", UHD_C))
    lib.handle = ctypes.c_void_p()
    lib.rx_streamer = ctypes.c_void_p()
    lib.rx_metadata = ctypes.c_void_p()
    lib.channel = ctypes.c_size_t(0)
    lib.lib.uhd_usrp_set_rx_rate.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                             ctypes.c_size_t]
    lib.lib.uhd_usrp_set_rx_gain.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                             ctypes.c_size_t, ctypes.c_char_p]
    lib.lib.uhd_usrp_set_rx_bandwidth.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                                  ctypes.c_size_t]
    lib.lib.uhd_rx_streamer_recv.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_double, ctypes.c_bool,
        ctypes.POINTER(ctypes.c_size_t)]

    assert lib.setup("")
    # C side validates uhd_tune_request_t field offsets and policy codes
    assert lib.set_center_freq(433.92e6) == 0
    assert lib.set_sample_rate(2e6) == 0
    # C side validates uhd_stream_args_t and stream_cmd layouts
    assert lib.start_stream()
    data = np.frombuffer(lib.receive_sync(), dtype=np.float32)
    np.testing.assert_allclose(data, [0.25, 0.5, 0.75, 1.0])
    lib.stop_stream()
    lib.close()
