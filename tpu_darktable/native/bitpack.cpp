// JPEG entropy bit-packer: the serial tail of the encoder that does not
// belong on the TPU.  The reference delegates this to nvJPEG
// (csrc/jpeg_encoder.cu); here the device produces (code, length) emission
// streams and this packer concatenates them MSB-first with JPEG 0xFF byte
// stuffing.  Built as a plain shared library, bound via ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libtdtpu.so bitpack.cpp

#include <cstdint>
#include <cstddef>

extern "C" {

// Pack n (code, length<=32) emissions MSB-first into out with 0xFF->0xFF00
// stuffing; pads the final partial byte with 1 bits.  Returns the number of
// bytes written, or -1 if capacity would be exceeded.
long long jpeg_pack_bits(
    const uint32_t* codes,
    const uint8_t* lengths,
    long long n,
    uint8_t* out,
    long long capacity)
{
    uint64_t acc = 0;   // bit accumulator, MSB-aligned in the low `nbits` bits
    int nbits = 0;
    long long written = 0;

    for (long long i = 0; i < n; ++i) {
        int len = lengths[i];
        acc = (acc << len) | (uint64_t)(codes[i] & ((len == 32) ? 0xFFFFFFFFu : ((1u << len) - 1u)));
        nbits += len;
        while (nbits >= 8) {
            uint8_t byte = (uint8_t)(acc >> (nbits - 8));
            nbits -= 8;
            if (written + 2 > capacity) return -1;
            out[written++] = byte;
            if (byte == 0xFF) out[written++] = 0x00;
        }
    }
    if (nbits > 0) {
        uint8_t byte = (uint8_t)((acc << (8 - nbits)) | ((1u << (8 - nbits)) - 1u));
        if (written + 2 > capacity) return -1;
        out[written++] = byte;
        if (byte == 0xFF) out[written++] = 0x00;
    }
    return written;
}

// Decode packed 12-bit RAW on the host (fast path for file loaders that want
// to avoid a device round-trip).  layout 0 = standard, 1 = IDS.
void decode12_u16_host(
    const uint8_t* packed,
    uint16_t* out,
    long long n_pairs,
    int ids_format)
{
    if (ids_format) {
        for (long long i = 0; i < n_pairs; ++i) {
            const uint8_t* p = packed + i * 3;
            out[i * 2] = (uint16_t)((p[0] << 4) | (p[2] & 0xF));
            out[i * 2 + 1] = (uint16_t)((p[1] << 4) | (p[2] >> 4));
        }
    } else {
        for (long long i = 0; i < n_pairs; ++i) {
            const uint8_t* p = packed + i * 3;
            out[i * 2] = (uint16_t)(((p[1] & 0xF) << 8) | p[0]);
            out[i * 2 + 1] = (uint16_t)((p[2] << 4) | (p[1] >> 4));
        }
    }
}

}  // extern "C"
