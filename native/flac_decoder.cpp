// Native FLAC decoder for the TPU alignment framework's data loader.
//
// Plays the role claxon (Rust) plays in the reference
// (/root/reference/src/bin/alignment_report.rs:1405-1445 read_flac_mono):
// decode 16 kHz LibriSpeech FLAC into integer PCM that Python scales and
// downmixes. Implements the FLAC subset needed for real-world files:
// CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) subframes, partitioned Rice
// residuals (4- and 5-bit parameters + escape codes), wasted bits, all four
// channel assignments (independent, left-side, right-side, mid-side), and
// UTF-8-coded frame numbers. CRCs are consumed but not verified (decode
// correctness is validated by round-trip tests instead).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;
    size_t byte_pos = 0;
    int bit_pos = 0;  // 0..7, MSB first
    bool error = false;

    bool at_end() const { return byte_pos >= size; }

    uint64_t read_bits(int n) {
        uint64_t v = 0;
        for (int i = 0; i < n; i++) {
            if (byte_pos >= size) {
                error = true;
                return 0;
            }
            v = (v << 1) | ((data[byte_pos] >> (7 - bit_pos)) & 1u);
            if (++bit_pos == 8) {
                bit_pos = 0;
                byte_pos++;
            }
        }
        return v;
    }

    int64_t read_signed(int n) {
        uint64_t v = read_bits(n);
        if (n == 0) return 0;
        uint64_t sign_bit = 1ull << (n - 1);
        if (v & sign_bit) return (int64_t)(v - (1ull << n));
        return (int64_t)v;
    }

    uint32_t read_unary() {
        uint32_t count = 0;
        while (true) {
            if (byte_pos >= size) {
                error = true;
                return count;
            }
            uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
            if (++bit_pos == 8) {
                bit_pos = 0;
                byte_pos++;
            }
            if (b) return count;
            count++;
            if (count > 1u << 24) {  // corrupt stream guard
                error = true;
                return count;
            }
        }
    }

    uint64_t read_utf8() {
        uint64_t first = read_bits(8);
        if (error) return 0;
        if ((first & 0x80) == 0) return first;
        int extra = 0;
        uint64_t v = 0;
        if ((first & 0xE0) == 0xC0) { extra = 1; v = first & 0x1F; }
        else if ((first & 0xF0) == 0xE0) { extra = 2; v = first & 0x0F; }
        else if ((first & 0xF8) == 0xF0) { extra = 3; v = first & 0x07; }
        else if ((first & 0xFC) == 0xF8) { extra = 4; v = first & 0x03; }
        else if ((first & 0xFE) == 0xFC) { extra = 5; v = first & 0x01; }
        else if (first == 0xFE) { extra = 6; v = 0; }
        else { error = true; return 0; }
        for (int i = 0; i < extra; i++) {
            uint64_t b = read_bits(8);
            if ((b & 0xC0) != 0x80) {
                error = true;
                return 0;
            }
            v = (v << 6) | (b & 0x3F);
        }
        return v;
    }

    void align_byte() {
        if (bit_pos != 0) {
            bit_pos = 0;
            byte_pos++;
        }
    }
};

bool decode_residual(BitReader& br, int order, uint32_t block_size,
                     std::vector<int64_t>& out) {
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return false;
    int param_bits = method == 0 ? 4 : 5;
    uint32_t escape = method == 0 ? 0xF : 0x1F;
    uint32_t partition_order = (uint32_t)br.read_bits(4);
    uint32_t partitions = 1u << partition_order;
    if (block_size % partitions != 0) return false;
    uint32_t part_len = block_size >> partition_order;
    if (part_len == 0) return false;
    // The first partition is shortened by the predictor order; a stream where
    // order > part_len is invalid and would underflow the count below.
    if ((uint32_t)order > part_len) return false;

    uint32_t sample_idx = order;
    for (uint32_t p = 0; p < partitions; p++) {
        uint32_t count = part_len - (p == 0 ? (uint32_t)order : 0);
        uint32_t param = (uint32_t)br.read_bits(param_bits);
        if (br.error) return false;
        if (param == escape) {
            uint32_t raw_bits = (uint32_t)br.read_bits(5);
            for (uint32_t i = 0; i < count; i++) {
                if (br.error || sample_idx >= block_size) return false;
                out[sample_idx++] = raw_bits == 0 ? 0 : br.read_signed(raw_bits);
            }
        } else {
            for (uint32_t i = 0; i < count; i++) {
                if (br.error || sample_idx >= block_size) return false;
                uint64_t q = br.read_unary();
                uint64_t bits = param ? br.read_bits(param) : 0;
                uint64_t u = (q << param) | bits;
                // zigzag decode
                out[sample_idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
            }
        }
        if (br.error || sample_idx > block_size) return false;
    }
    return sample_idx == block_size;
}

bool decode_subframe(BitReader& br, uint32_t block_size, int bits_per_sample,
                     std::vector<int64_t>& out) {
    if (br.read_bits(1) != 0) return false;  // mandatory zero pad
    uint32_t type = (uint32_t)br.read_bits(6);
    int wasted = 0;
    if (br.read_bits(1)) wasted = (int)br.read_unary() + 1;
    if (br.error) return false;
    int bps = bits_per_sample - wasted;
    if (bps <= 0 || bps > 33) return false;

    out.assign(block_size, 0);

    if (type == 0) {  // CONSTANT
        int64_t v = br.read_signed(bps);
        for (uint32_t i = 0; i < block_size; i++) out[i] = v;
    } else if (type == 1) {  // VERBATIM
        for (uint32_t i = 0; i < block_size; i++) out[i] = br.read_signed(bps);
    } else if (type >= 8 && type <= 12) {  // FIXED, order = type - 8
        int order = (int)type - 8;
        if ((uint32_t)order > block_size) return false;
        for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
        if (!decode_residual(br, order, block_size, out)) return false;
        // restore fixed prediction
        for (uint32_t i = order; i < block_size; i++) {
            int64_t pred = 0;
            switch (order) {
                case 0: pred = 0; break;
                case 1: pred = out[i - 1]; break;
                case 2: pred = 2 * out[i - 1] - out[i - 2]; break;
                case 3: pred = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
                case 4:
                    pred = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
                           out[i - 4];
                    break;
            }
            out[i] += pred;
        }
    } else if (type >= 32) {  // LPC, order = (type & 31) + 1
        int order = (int)(type & 31) + 1;
        if ((uint32_t)order > block_size) return false;
        for (int i = 0; i < order; i++) out[i] = br.read_signed(bps);
        int precision = (int)br.read_bits(4) + 1;
        if (precision == 16) return false;  // 0b1111 is invalid
        int shift = (int)br.read_signed(5);
        if (shift < 0) return false;
        std::vector<int64_t> coef(order);
        for (int i = 0; i < order; i++) coef[i] = br.read_signed(precision);
        if (!decode_residual(br, order, block_size, out)) return false;
        for (uint32_t i = order; i < block_size; i++) {
            int64_t pred = 0;
            for (int j = 0; j < order; j++) pred += coef[j] * out[i - 1 - j];
            out[i] += pred >> shift;
        }
    } else {
        return false;  // reserved
    }
    if (br.error) return false;
    if (wasted > 0) {
        for (uint32_t i = 0; i < block_size; i++) out[i] <<= wasted;
    }
    return true;
}

struct StreamInfo {
    uint32_t sample_rate = 0;
    uint32_t channels = 0;
    uint32_t bits_per_sample = 0;
    uint64_t total_samples = 0;
};

}  // namespace

extern "C" {

struct FlacDecoded {
    int32_t* samples;  // interleaved [n_frames * channels]
    uint64_t n_frames;
    uint32_t sample_rate;
    uint32_t channels;
    uint32_t bits_per_sample;
};

namespace {

int flac_decode_buffer_impl(const uint8_t* data, size_t size,
                            FlacDecoded* result) {
    if (!data || size < 8 || !result) return -1;
    if (memcmp(data, "fLaC", 4) != 0) return -2;

    size_t pos = 4;
    StreamInfo info;
    bool have_streaminfo = false;
    // metadata blocks
    while (pos + 4 <= size) {
        uint8_t header = data[pos];
        bool last = header & 0x80;
        uint8_t type = header & 0x7F;
        uint32_t len = ((uint32_t)data[pos + 1] << 16) |
                       ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
        pos += 4;
        if (pos + len > size) return -3;
        if (type == 0 && len >= 34) {  // STREAMINFO
            const uint8_t* b = data + pos;
            info.sample_rate =
                ((uint32_t)b[10] << 12) | ((uint32_t)b[11] << 4) | (b[12] >> 4);
            info.channels = ((b[12] >> 1) & 0x7) + 1;
            info.bits_per_sample = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
            info.total_samples = ((uint64_t)(b[13] & 0xF) << 32) |
                                 ((uint64_t)b[14] << 24) | ((uint64_t)b[15] << 16) |
                                 ((uint64_t)b[16] << 8) | b[17];
            have_streaminfo = true;
        }
        pos += len;
        if (last) break;
    }
    if (!have_streaminfo || info.sample_rate == 0) return -4;

    BitReader br{data + pos, size - pos};
    std::vector<int32_t> pcm;
    if (info.total_samples) {
        // STREAMINFO's 36-bit total_samples is untrusted; cap the upfront
        // reservation (~64 MB of int32) — longer valid streams still decode,
        // they just pay vector growth instead of a crafted-file huge alloc.
        constexpr size_t kMaxReserve = 16ull * 1024 * 1024;
        size_t want = (size_t)info.total_samples * info.channels;
        pcm.reserve(want < kMaxReserve ? want : kMaxReserve);
    }

    static const uint32_t kRateTable[12] = {0,     88200, 176400, 192000,
                                            8000,  16000, 22050,  24000,
                                            32000, 44100, 48000,  96000};

    while (!br.at_end() && !br.error) {
        // frame sync: 14 bits 0b11111111111110
        uint64_t sync = br.read_bits(14);
        if (br.error) break;  // clean EOF
        if (sync != 0x3FFE) return -5;
        br.read_bits(1);  // reserved
        br.read_bits(1);  // blocking strategy
        uint32_t bs_code = (uint32_t)br.read_bits(4);
        uint32_t sr_code = (uint32_t)br.read_bits(4);
        uint32_t ch_code = (uint32_t)br.read_bits(4);
        uint32_t ss_code = (uint32_t)br.read_bits(3);
        br.read_bits(1);  // reserved
        br.read_utf8();   // frame/sample number

        uint32_t block_size;
        if (bs_code == 1) block_size = 192;
        else if (bs_code >= 2 && bs_code <= 5) block_size = 576u << (bs_code - 2);
        else if (bs_code == 6) block_size = (uint32_t)br.read_bits(8) + 1;
        else if (bs_code == 7) block_size = (uint32_t)br.read_bits(16) + 1;
        else if (bs_code >= 8) block_size = 256u << (bs_code - 8);
        else return -6;

        if (sr_code == 12) br.read_bits(8);
        else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
        else if (sr_code == 15) return -7;
        (void)kRateTable;

        int bits_per_sample;
        switch (ss_code) {
            case 0: bits_per_sample = (int)info.bits_per_sample; break;
            case 1: bits_per_sample = 8; break;
            case 2: bits_per_sample = 12; break;
            case 4: bits_per_sample = 16; break;
            case 5: bits_per_sample = 20; break;
            case 6: bits_per_sample = 24; break;
            case 7: bits_per_sample = 32; break;
            default: return -8;
        }

        uint32_t channels;
        int assignment = -1;  // -1: independent; 0: L/S, 1: R/S, 2: M/S
        if (ch_code <= 7) channels = ch_code + 1;
        else if (ch_code == 8) { channels = 2; assignment = 0; }
        else if (ch_code == 9) { channels = 2; assignment = 1; }
        else if (ch_code == 10) { channels = 2; assignment = 2; }
        else return -9;
        if (channels != info.channels) return -10;

        br.read_bits(8);  // header CRC-8 (consumed, not verified)
        if (br.error) return -11;

        std::vector<std::vector<int64_t>> chans(channels);
        for (uint32_t c = 0; c < channels; c++) {
            int bps = bits_per_sample;
            // side channel carries one extra bit
            if ((assignment == 0 && c == 1) || (assignment == 1 && c == 0) ||
                (assignment == 2 && c == 1))
                bps += 1;
            if (!decode_subframe(br, block_size, bps, chans[c])) return -12;
        }
        br.align_byte();
        br.read_bits(16);  // frame CRC-16 (consumed, not verified)
        if (br.error) return -13;

        // stereo decorrelation
        if (assignment == 0) {  // left/side: R = L - S
            for (uint32_t i = 0; i < block_size; i++)
                chans[1][i] = chans[0][i] - chans[1][i];
        } else if (assignment == 1) {  // right/side: L = R + S
            for (uint32_t i = 0; i < block_size; i++) {
                int64_t side = chans[0][i];
                chans[0][i] = chans[1][i] + side;
            }
        } else if (assignment == 2) {  // mid/side
            for (uint32_t i = 0; i < block_size; i++) {
                int64_t mid = chans[0][i];
                int64_t side = chans[1][i];
                mid = (mid << 1) | (side & 1);
                chans[0][i] = (mid + side) >> 1;
                chans[1][i] = (mid - side) >> 1;
            }
        }

        for (uint32_t i = 0; i < block_size; i++)
            for (uint32_t c = 0; c < channels; c++)
                pcm.push_back((int32_t)chans[c][i]);

        if (info.total_samples &&
            pcm.size() >= info.total_samples * info.channels) {
            pcm.resize((size_t)(info.total_samples * info.channels));
            break;
        }
    }

    uint64_t n_frames = pcm.size() / info.channels;
    int32_t* out = (int32_t*)malloc(pcm.size() * sizeof(int32_t));
    if (!out && !pcm.empty()) return -14;
    memcpy(out, pcm.data(), pcm.size() * sizeof(int32_t));
    result->samples = out;
    result->n_frames = n_frames;
    result->sample_rate = info.sample_rate;
    result->channels = info.channels;
    result->bits_per_sample = info.bits_per_sample;
    return 0;
}

}  // namespace

// Returns 0 on success; negative error codes otherwise. Exceptions (e.g.
// std::bad_alloc on a crafted stream) must not cross the C ABI.
int flac_decode_buffer(const uint8_t* data, size_t size, FlacDecoded* result) {
    try {
        return flac_decode_buffer_impl(data, size, result);
    } catch (...) {
        return -15;
    }
}

int flac_decode_file(const char* path, FlacDecoded* result) {
    FILE* f = fopen(path, "rb");
    if (!f) return -20;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    if (sz <= 0) {
        fclose(f);
        return -21;
    }
    std::vector<uint8_t> buf((size_t)sz);
    size_t got = fread(buf.data(), 1, (size_t)sz, f);
    fclose(f);
    if (got != (size_t)sz) return -22;
    return flac_decode_buffer(buf.data(), buf.size(), result);
}

void flac_free(FlacDecoded* result) {
    if (result && result->samples) {
        free(result->samples);
        result->samples = nullptr;
    }
}

}  // extern "C"
