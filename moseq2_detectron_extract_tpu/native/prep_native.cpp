// One-pass depth-frame preprocessing (host side of the sentinel-encoded
// H2D path; see ops/preprocess.py:prep_raw_frames_host).
//
// The numpy implementation makes ~8 full passes over the chunk
// (bool mask, int32 cast, subtract, roi multiply, vmin floor, clip, cast,
// sentinel scatter) — ~40 bytes of memory traffic per pixel. This kernel
// does the whole transform in ONE pass (~11 B/px), which matters because
// the extraction host is single-core and the prep was the Read Depth
// stage's dominant cost (measured 22.7 s / 3000 frames numpy vs ~2 s here).
//
// Semantics are bit-identical to the numpy path for uint16 input /
// unsigned-int8 output:
//   invalid = raw == 0
//   x       = bg - raw            (int32; bg==NULL -> x = raw)
//   x      *= roi                 (roi==NULL -> skip; any int roi values)
//   x       = x <  vmin_i ? 0 : x (has_vmin only; vmin_i = ceil(vmin))
//   x       = clip(x, lo, hi)     (hi = min(vmax, dtype_max-1))
//   out     = (uint8) x; invalid pixels -> sentinel (dtype max)
#include <cstdint>

extern "C" int prep_frames_native(
    const uint8_t* frames_base,  // base pointer at the bbox origin
    long stride_t, long stride_y,  // byte strides (x must be contiguous u16)
    const int32_t* bg,             // (h, w) contiguous or NULL
    const int32_t* roi,            // (h, w) contiguous or NULL
    long t, long h, long w,
    int has_vmin, int vmin_i,
    int lo, int hi,
    int sentinel,
    uint8_t* out)                  // (t, h, w) contiguous uint8
{
    for (long f = 0; f < t; ++f) {
        const uint8_t* fp = frames_base + f * stride_t;
        uint8_t* op = out + f * h * w;
        for (long y = 0; y < h; ++y) {
            const uint16_t* row =
                reinterpret_cast<const uint16_t*>(fp + y * stride_y);
            const int32_t* bgr = bg ? bg + y * w : nullptr;
            const int32_t* rr = roi ? roi + y * w : nullptr;
            uint8_t* orow = op + y * w;
            for (long x = 0; x < w; ++x) {
                const int v = row[x];
                int val = bgr ? (bgr[x] - v) : v;
                if (rr) val *= rr[x];
                if (has_vmin && val < vmin_i) val = 0;
                val = val < lo ? lo : (val > hi ? hi : val);
                orow[x] = static_cast<uint8_t>(v == 0 ? sentinel : val);
            }
        }
    }
    return 0;
}
