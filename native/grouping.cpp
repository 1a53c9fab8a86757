// Native word-grouping engine for the TPU alignment framework.
//
// Plays the role the reference's compiled Rust grouping plays
// (/root/reference/src/alignment/grouping/{path_to_words,blank_expansion,
// candidate_selector,mod}.rs): the host-side hot loop that turns a Viterbi
// path + per-frame evidence into word timings with calibrated confidences.
// The Python implementation in wav2vec2_tpu/align/grouping is the behavioral
// oracle (and stays the debug/profiling path); this C++ port must produce
// BIT-IDENTICAL output — same f32 accumulation orders, same f64 widenings,
// same tie-breaking — which the golden fixtures and randomized equivalence
// tests enforce (tests/test_native_grouping.py).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment). All
// transcendentals (exp) go through libm doubles, the same functions CPython
// and numpy scalars use on this platform, so results match to the bit.

#include <algorithm>
#include <chrono>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Policy {
    int32_t max_left;
    int32_t max_right;
    int32_t min_silence;
    int32_t is_balanced;  // shares the first policy's name (tie preference)
};

struct HyperParams {
    double weight_boundary_confidence;  // 3.2
    double weight_boundary_shift;       // 0.8
    double weight_pause_plausibility;   // 1.3
    int32_t large_gap_threshold_frames; // 8
    double overlap_penalty_per_frame;   // 12.0
    double near_collapse_penalty;       // 4.0
    double weight_geo_mean;             // 0.40
    double weight_margin;               // 0.30
    double weight_p10;                  // 0.20
    double weight_boundary;             // 0.10
    int32_t n_policies;
    int32_t n_knots;
    Policy policies[8];
    double knots[16][2];
};

struct OutWord {
    int32_t state_offset;   // into out_state_idx (chars composing the word)
    int32_t state_len;
    int32_t start_ms;
    int32_t end_ms;
    int32_t coverage_frame_count;
    int32_t has_confidence, has_mean_logp, has_geo, has_min, has_p10,
            has_margin, has_bc, has_qc, has_cc;
    float confidence;
    float mean_logp, geo_mean_prob, min_logp, p10_logp, mean_margin;
    float boundary_confidence, quality_confidence, calibrated_confidence;
};

struct Raw {
    std::vector<int32_t> states;  // state index per emitted char
    int32_t start_frame = 0;
    int32_t end_frame = 0;
    bool has_conf = false;
    float confidence = 0.0f;
    // stats
    bool has_stats = false;
    float mean_logp = 0, geo = 0, min_logp = 0, p10 = 0;
    bool has_margin = false;
    float mean_margin = 0;
    int32_t coverage = 0;
    bool has_bc = false;
    float bc = 0;
};

float percentile_sorted(const std::vector<float>& s, float pct) {
    if (s.empty()) return 0.0f;
    if (s.size() == 1) return s[0];
    float clamped = std::min(std::max(pct, 0.0f), 1.0f);
    float max_index = (float)(s.size() - 1);
    float rank = clamped * max_index;
    int lower = (int)std::floor(rank);
    int upper = (int)std::ceil(rank);
    if (lower == upper) return s[lower];
    float weight = rank - (float)lower;
    return s[lower] * (1.0f - weight) + s[upper] * weight;
}

void build_stats(Raw& w, const std::vector<float>& lp_accum,
                 const std::vector<float>& margin_accum, int32_t coverage) {
    w.coverage = coverage;
    if (lp_accum.empty()) {
        w.has_stats = false;
        w.has_conf = false;
        return;
    }
    float acc = 0.0f;
    for (float v : lp_accum) acc += v;  // f32 sequential sum
    float mean_logp = acc / (float)lp_accum.size();

    std::vector<float> sorted_lps(lp_accum);
    std::sort(sorted_lps.begin(), sorted_lps.end());
    float min_logp = sorted_lps[0];
    float p10 = percentile_sorted(sorted_lps, 0.10f);

    if (!margin_accum.empty()) {
        float macc = 0.0f;
        for (float v : margin_accum) macc += v;
        w.mean_margin = macc / (float)margin_accum.size();
        w.has_margin = true;
    }
    // geo = f32(max(exp(f64 mean_logp), f32 min positive))
    double g = std::exp((double)mean_logp);
    if (g < (double)FLT_MIN) g = (double)FLT_MIN;
    w.geo = (float)g;
    w.mean_logp = mean_logp;
    w.min_logp = min_logp;
    w.p10 = p10;
    w.has_stats = true;
    w.has_conf = true;
    w.confidence = w.geo;
}

// --- phase 1: path -> raw words (path_to_words.rs:201-244) ---

std::vector<Raw> collect(
    const int32_t* path, int32_t t_len,
    const int32_t* tokens, const int32_t* lchar_cp, int32_t s_len,
    const uint32_t* exp_off, const uint32_t* exp_cps, int32_t n_expected,
    const float* emit_lp, const float* margin,
    int32_t blank_id, int32_t word_sep_id, bool* ok) {
    *ok = true;
    std::vector<Raw> words;
    std::vector<int32_t> cur_states;
    std::vector<int32_t> cur_lcps;
    int32_t start_frame = -1;
    int32_t end_frame = 0;
    std::vector<float> lp_accum, margin_accum;
    int32_t coverage = 0;
    int32_t prev_state = -1;
    bool have_prev = false;

    auto matches_expected = [&](void) -> bool {
        size_t produced = words.size();
        if ((int32_t)produced >= n_expected) return true;
        uint32_t lo = exp_off[produced], hi = exp_off[produced + 1];
        if (hi - lo != cur_lcps.size()) return false;
        for (uint32_t i = lo; i < hi; i++) {
            if ((int32_t)exp_cps[i] != cur_lcps[i - lo]) return false;
        }
        return true;
    };

    auto flush = [&](void) {
        if (cur_states.empty()) return;
        Raw w;
        w.states = cur_states;
        w.start_frame = start_frame >= 0 ? start_frame : end_frame;
        w.end_frame = end_frame;
        build_stats(w, lp_accum, margin_accum, coverage);
        words.push_back(std::move(w));
        cur_states.clear();
        cur_lcps.clear();
        start_frame = -1;
        lp_accum.clear();
        margin_accum.clear();
        coverage = 0;
    };

    for (int32_t frame = 0; frame < t_len; frame++) {
        int32_t s = path[frame];
        if (s < 0 || s >= s_len) {  // malformed path: error out, caller falls back
            *ok = false;
            return words;
        }
        int32_t tid = tokens[s];
        if (tid == blank_id) {
            prev_state = s;
            have_prev = true;
            continue;
        }
        if (tid == word_sep_id) {
            if (!cur_states.empty() && !matches_expected()) {
                prev_state = s;
                have_prev = true;
                continue;
            }
            flush();
            prev_state = s;
            have_prev = true;
            continue;
        }
        if (lchar_cp[s] >= 0) {
            bool is_new_state = !(have_prev && prev_state == s);
            if (start_frame < 0) start_frame = frame;
            end_frame = frame;
            coverage += 1;
            if (is_new_state) {
                lp_accum.push_back(emit_lp[frame]);
                margin_accum.push_back(margin[frame]);
                cur_states.push_back(s);
                cur_lcps.push_back(lchar_cp[s]);
            }
        }
        prev_state = s;
        have_prev = true;
    }
    flush();
    return words;
}

// --- phase 2: blank expansion (blank_expansion.rs:89-118) ---

struct Cand {
    std::vector<int32_t> start, end;  // frames per word
};

Cand expand(const std::vector<Raw>& raw, const Policy& p) {
    Cand c;
    c.start.reserve(raw.size());
    c.end.reserve(raw.size());
    for (const Raw& w : raw) {
        c.start.push_back(w.start_frame);
        c.end.push_back(w.end_frame);
    }
    for (size_t i = 0; i + 1 < raw.size(); i++) {
        int32_t prev_end = c.end[i];
        int32_t next_start = c.start[i + 1];
        if (next_start <= prev_end + 1) continue;
        int32_t gap = next_start - prev_end - 1;
        int32_t min_silence = std::min(p.min_silence, gap);
        int32_t absorb = gap - min_silence;
        int32_t left_take = std::min(absorb, p.max_left);
        int32_t right_take = std::min(std::max(absorb - left_take, 0), p.max_right);
        c.end[i] = prev_end + left_take;
        c.start[i + 1] = next_start - right_take;
    }
    return c;
}

// --- phase 3: candidate scoring (candidate_selector.rs) ---

struct Scored {
    double total = 0.0;
    std::vector<bool> has_bc;
    std::vector<float> bc;
};

Scored score_candidate(const std::vector<Raw>& raw, const Cand& cand,
                       const double* blank_prob, int32_t t_len,
                       const HyperParams& hp) {
    Scored out;
    size_t n = raw.size();
    out.has_bc.assign(n, false);
    out.bc.assign(n, 0.0f);
    if (n == 0 || cand.start.size() != n) {
        out.total = -2000000.0;
        return out;
    }

    // boundary evidence: mean blank prob over absorbed frames
    double blank_sum = 0.0;
    int64_t count = 0;
    std::vector<double> per_sum(n, 0.0);
    std::vector<int64_t> per_cnt(n, 0);
    auto absorb = [&](int32_t lo, int32_t hi_excl, size_t idx) {
        for (int32_t f = lo; f < hi_excl; f++) {
            if (f >= 0 && f < t_len) {
                double bp = blank_prob[f];
                blank_sum += bp;
                count += 1;
                per_sum[idx] += bp;
                per_cnt[idx] += 1;
            }
        }
    };
    for (size_t i = 0; i < n; i++) {
        if (cand.start[i] < raw[i].start_frame)
            absorb(cand.start[i], raw[i].start_frame, i);
        if (cand.end[i] > raw[i].end_frame)
            absorb(raw[i].end_frame + 1, cand.end[i] + 1, i);
    }
    for (size_t i = 0; i < n; i++) {
        if (per_cnt[i]) {
            out.has_bc[i] = true;
            out.bc[i] = (float)(per_sum[i] / (double)per_cnt[i]);
        }
    }
    double mean_blank = count ? blank_sum / (double)count : 0.0;

    double shift_sum = 0.0;
    for (size_t i = 0; i < n; i++) {
        double start_shift = std::fabs((double)(cand.start[i] - raw[i].start_frame));
        double end_shift = std::fabs((double)(cand.end[i] - raw[i].end_frame));
        double conf_weight = 0.75 + (raw[i].has_conf ? (double)raw[i].confidence : 0.0);
        shift_sum += conf_weight * (start_shift + end_shift);
    }
    double boundary_shift_penalty = shift_sum / (double)n;

    double pause_penalty = 0.0;
    int64_t gap_count = 0;
    for (size_t i = 0; i + 1 < n; i++) {
        int32_t raw_gap = raw[i + 1].start_frame - raw[i].end_frame - 1;
        int32_t cand_gap = cand.start[i + 1] - cand.end[i] - 1;
        gap_count += 1;
        if (cand_gap < 0)
            pause_penalty += (double)(-cand_gap) * hp.overlap_penalty_per_frame;
        if (raw_gap >= hp.large_gap_threshold_frames) {
            double collapsed = (double)std::max(raw_gap - cand_gap, 0);
            pause_penalty += collapsed;
            if (cand_gap <= 1) pause_penalty += hp.near_collapse_penalty;
        }
    }
    if (gap_count > 0) pause_penalty /= (double)gap_count;

    out.total = hp.weight_boundary_confidence * mean_blank
              - hp.weight_boundary_shift * boundary_shift_penalty
              - hp.weight_pause_plausibility * pause_penalty;
    return out;
}

double sigmoid(double x) { return 1.0 / (1.0 + std::exp(-x)); }

// quality confidence (grouping/mod.rs:163-194 / confidence.py)
bool quality_confidence(const Raw& w, const HyperParams& hp, float* out) {
    if (!w.has_stats) return false;
    double geo = (double)w.geo;
    double weighted = hp.weight_geo_mean * geo;
    double total_w = hp.weight_geo_mean;
    if (w.has_margin) {
        double m = ((double)w.mean_margin - 1.0) / 1.5;
        weighted += hp.weight_margin * sigmoid(m);
        total_w += hp.weight_margin;
    }
    {   // p10 present whenever stats are present
        double p10_prob = std::exp((double)w.p10);
        p10_prob = std::min(std::max(p10_prob, 0.0), 1.0);
        weighted += hp.weight_p10 * p10_prob;
        total_w += hp.weight_p10;
    }
    double boundary = w.has_bc ? (double)w.bc : 0.5;
    boundary = std::min(std::max(boundary, 0.0), 1.0);
    weighted += hp.weight_boundary * boundary;
    total_w += hp.weight_boundary;
    if (total_w <= 0.0) return false;
    double v = std::min(std::max(weighted / total_w, 0.0), 1.0);
    *out = (float)v;
    return true;
}

float calibrate(float score, const HyperParams& hp) {
    double x = std::min(std::max((double)score, 0.0), 1.0);
    for (int i = 0; i + 1 < hp.n_knots; i++) {
        double x0 = hp.knots[i][0], y0 = hp.knots[i][1];
        double x1 = hp.knots[i + 1][0], y1 = hp.knots[i + 1][1];
        if (x <= x1) {
            double t = std::fabs(x1 - x0) < DBL_EPSILON ? 0.0 : (x - x0) / (x1 - x0);
            double y = std::min(std::max(y0 + t * (y1 - y0), 0.0), 1.0);
            return (float)y;
        }
    }
    return 0.99f;
}

}  // namespace

extern "C" {

// Returns the number of words written (>= 0), or a negative error code.
// Timings (collect/expand+select/conf, ms) are written to out_timings[3].
int32_t group_words_native(
    const int32_t* path, int32_t t_len,
    const int32_t* tokens, const int32_t* lchar_cp, int32_t s_len,
    const uint32_t* exp_off, const uint32_t* exp_cps, int32_t n_expected,
    const float* emit_lp, const float* margin, const double* blank_prob,
    int32_t blank_id, int32_t word_sep_id, double stride_ms,
    const HyperParams* hp,
    OutWord* out_words, int32_t max_words,
    int32_t* out_state_idx, int32_t max_states,
    double* out_timings) {
    using clk = std::chrono::steady_clock;
    if (!path || !tokens || !lchar_cp || !emit_lp || !margin || !blank_prob ||
        !hp || !out_words || !out_state_idx || !out_timings)
        return -1;
    if (hp->n_policies < 1 || hp->n_policies > 8 || hp->n_knots < 2 ||
        hp->n_knots > 16)
        return -2;

    auto t0 = clk::now();
    bool ok = true;
    std::vector<Raw> raw = collect(path, t_len, tokens, lchar_cp, s_len,
                                   exp_off, exp_cps, n_expected,
                                   emit_lp, margin, blank_id, word_sep_id, &ok);
    if (!ok) return -5;
    auto t1 = clk::now();
    out_timings[0] = std::chrono::duration<double, std::milli>(t1 - t0).count();

    if ((int32_t)raw.size() > max_words) return -3;
    if (raw.empty()) {
        out_timings[1] = 0.0;
        out_timings[2] = 0.0;
        return 0;
    }

    // expand with every policy, score, select (ties prefer balanced)
    int best_idx = -1;
    double best_score = 0.0;
    bool best_is_balanced = false;
    std::vector<Cand> cands(hp->n_policies);
    std::vector<Scored> scores(hp->n_policies);
    for (int32_t p = 0; p < hp->n_policies; p++) {
        cands[p] = expand(raw, hp->policies[p]);
        scores[p] = score_candidate(raw, cands[p], blank_prob, t_len, *hp);
        bool replace;
        if (best_idx < 0) {
            replace = true;
        } else if (scores[p].total > best_score + 1e-6) {
            replace = true;
        } else if (std::fabs(scores[p].total - best_score) <= 1e-6 &&
                   hp->policies[p].is_balanced && !best_is_balanced) {
            replace = true;
        } else {
            replace = false;
        }
        if (replace) {
            best_idx = p;
            best_score = scores[p].total;
            best_is_balanced = hp->policies[p].is_balanced != 0;
        }
    }
    const Cand& chosen = cands[best_idx];
    const Scored& chosen_sc = scores[best_idx];
    auto t2 = clk::now();
    out_timings[1] = std::chrono::duration<double, std::milli>(t2 - t1).count();

    // confidence + ms conversion
    int32_t state_cursor = 0;
    for (size_t i = 0; i < raw.size(); i++) {
        Raw w = raw[i];  // copy; boundaries come from the chosen candidate
        w.start_frame = chosen.start[i];
        w.end_frame = chosen.end[i];
        w.has_bc = chosen_sc.has_bc[i];
        w.bc = chosen_sc.bc[i];

        OutWord& o = out_words[i];
        std::memset(&o, 0, sizeof(OutWord));
        if (state_cursor + (int32_t)w.states.size() > max_states) return -4;
        o.state_offset = state_cursor;
        o.state_len = (int32_t)w.states.size();
        for (int32_t s : w.states) out_state_idx[state_cursor++] = s;

        o.start_ms = (int32_t)((double)w.start_frame * stride_ms);
        o.end_ms = (int32_t)((double)(w.end_frame + 1) * stride_ms);
        o.coverage_frame_count = w.coverage;
        if (w.has_stats) {
            o.has_mean_logp = o.has_geo = o.has_min = o.has_p10 = 1;
            o.mean_logp = w.mean_logp;
            o.geo_mean_prob = w.geo;
            o.min_logp = w.min_logp;
            o.p10_logp = w.p10;
        }
        if (w.has_margin) {
            o.has_margin = 1;
            o.mean_margin = w.mean_margin;
        }
        if (w.has_bc) {
            o.has_bc = 1;
            o.boundary_confidence = w.bc;
        }
        float qc;
        if (quality_confidence(w, *hp, &qc)) {
            o.has_qc = 1;
            o.quality_confidence = qc;
            o.has_cc = 1;
            o.calibrated_confidence = calibrate(qc, *hp);
            o.has_confidence = 1;
            o.confidence = o.calibrated_confidence;
        }
    }
    auto t3 = clk::now();
    out_timings[2] = std::chrono::duration<double, std::milli>(t3 - t2).count();
    return (int32_t)raw.size();
}

}  // extern "C"
