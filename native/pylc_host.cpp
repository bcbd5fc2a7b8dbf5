// PyLC-TPU native host library: hot host-side byte transforms.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the
// host-bound byte work around it — the transforms the reference delegated
// to numpy/torch per-pixel Python loops (utils/tools.py:322-449 palette
// codecs, utils/extract.py:279-310 tile unfold).  Used by the DB writer /
// evaluator when round-tripping through the accelerator would cost more
// than it saves (e.g. encoding a 10 MP ground-truth mask on host while
// the device is busy with the forward pass).
//
// Build: g++ -O3 -shared -fPIC -o libpylc_host.so pylc_host.cpp
// Binding: ctypes (pylc_tpu/native.py); plain C ABI below.

#include <cstdint>
#include <cstring>

extern "C" {

// RGB mask -> class indices.
// rgb:      [n_px, 3] uint8
// palette:  [n_classes, 3] uint8
// out:      [n_px] uint8
// Unmatched pixels get default_class (reference quirk: class 1,
// utils/tools.py:437).
// Strategy: 24-bit direct LUT (16 MiB) when n_px is large enough to
// amortize building it; linear palette scan otherwise.
void class_encode_u8(const uint8_t* rgb, int64_t n_px,
                     const uint8_t* palette, int32_t n_classes,
                     uint8_t default_class, uint8_t* out) {
    const int64_t LUT_THRESHOLD = 1 << 20;  // 1 Mpx
    if (n_px >= LUT_THRESHOLD) {
        static thread_local uint8_t* lut = nullptr;
        if (!lut) lut = new uint8_t[1 << 24];
        std::memset(lut, default_class, 1 << 24);
        for (int32_t c = 0; c < n_classes; ++c) {
            uint32_t key = (uint32_t(palette[c * 3]) << 16) |
                           (uint32_t(palette[c * 3 + 1]) << 8) |
                           uint32_t(palette[c * 3 + 2]);
            lut[key] = uint8_t(c);
        }
        for (int64_t i = 0; i < n_px; ++i) {
            const uint8_t* p = rgb + i * 3;
            uint32_t key = (uint32_t(p[0]) << 16) |
                           (uint32_t(p[1]) << 8) | uint32_t(p[2]);
            out[i] = lut[key];
        }
    } else {
        for (int64_t i = 0; i < n_px; ++i) {
            const uint8_t* p = rgb + i * 3;
            uint8_t cls = default_class;
            for (int32_t c = 0; c < n_classes; ++c) {
                const uint8_t* pc = palette + c * 3;
                if (p[0] == pc[0] && p[1] == pc[1] && p[2] == pc[2]) {
                    cls = uint8_t(c);
                    break;
                }
            }
            out[i] = cls;
        }
    }
}

// class indices -> RGB via palette gather.
// cm: [n_px] uint8; palette: [n_classes, 3]; out: [n_px, 3]
void colourize_u8(const uint8_t* cm, int64_t n_px,
                  const uint8_t* palette, int32_t n_classes,
                  uint8_t* out) {
    for (int64_t i = 0; i < n_px; ++i) {
        uint8_t c = cm[i];
        if (c >= n_classes) c = 0;
        const uint8_t* pc = palette + int64_t(c) * 3;
        uint8_t* o = out + i * 3;
        o[0] = pc[0]; o[1] = pc[1]; o[2] = pc[2];
    }
}

// Image [H, W, C] u8 -> tiles [N, C, tile, tile] u8 (NCHW, the DB
// layout), row-major grid order matching torch unfold(0).unfold(1)
// (utils/extract.py:301-308).
void unfold_tiles_u8(const uint8_t* img, int32_t H, int32_t W, int32_t C,
                     int32_t tile, int32_t stride, uint8_t* out) {
    const int32_t n_rows = (H - tile) / stride + 1;
    const int32_t n_cols = (W - tile) / stride + 1;
    const int64_t tile_px = int64_t(tile) * tile;
    for (int32_t i = 0; i < n_rows; ++i) {
        for (int32_t j = 0; j < n_cols; ++j) {
            uint8_t* dst = out +
                (int64_t(i) * n_cols + j) * C * tile_px;
            const uint8_t* src0 = img +
                (int64_t(i) * stride * W + int64_t(j) * stride) * C;
            for (int32_t c = 0; c < C; ++c) {
                uint8_t* dc = dst + int64_t(c) * tile_px;
                for (int32_t y = 0; y < tile; ++y) {
                    const uint8_t* srow = src0 + int64_t(y) * W * C + c;
                    uint8_t* drow = dc + int64_t(y) * tile;
                    for (int32_t x = 0; x < tile; ++x) {
                        drow[x] = srow[int64_t(x) * C];
                    }
                }
            }
        }
    }
}

// Paired Fisher-Yates co-shuffle of img [N, stride_i bytes] and
// mask [N, stride_m bytes] using an xorshift PRNG (explicit seed).
void coshuffle_u8(uint8_t* imgs, uint8_t* masks, int64_t n,
                  int64_t stride_i, int64_t stride_m, uint64_t seed) {
    uint64_t s = seed ? seed : 0x9E3779B97F4A7C15ull;
    auto next = [&s]() {
        s ^= s << 13; s ^= s >> 7; s ^= s << 17;
        return s;
    };
    uint8_t* tmp_i = new uint8_t[stride_i];
    uint8_t* tmp_m = new uint8_t[stride_m];
    for (int64_t i = n - 1; i > 0; --i) {
        int64_t j = int64_t(next() % uint64_t(i + 1));
        if (i == j) continue;
        std::memcpy(tmp_i, imgs + i * stride_i, stride_i);
        std::memcpy(imgs + i * stride_i, imgs + j * stride_i, stride_i);
        std::memcpy(imgs + j * stride_i, tmp_i, stride_i);
        std::memcpy(tmp_m, masks + i * stride_m, stride_m);
        std::memcpy(masks + i * stride_m, masks + j * stride_m, stride_m);
        std::memcpy(masks + j * stride_m, tmp_m, stride_m);
    }
    delete[] tmp_i;
    delete[] tmp_m;
}

}  // extern "C"
