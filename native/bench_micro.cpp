// Micro-bench of the native MSM path at IPP-round sizes (m=1 analysis).
// Build: g++ -O3 -march=native -std=c++17 -DBP_MICRO_BENCH -o bench_micro \
//            bench_micro.cpp -lpthread   (includes bpcore.cpp for statics)
#include <chrono>
#include <cmath>
#include <cstdio>
#include <random>

#undef FP_ZERO  // math.h classification macro clashes with bpcore's constant
#include "bpcore.cpp"

static double now_us() {
    return std::chrono::duration<double, std::micro>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

template <typename F>
static double best_of(int reps, F f) {
    double best = 1e30;
    for (int r = 0; r < reps; ++r) {
        double t0 = now_us();
        f();
        double dt = now_us() - t0;
        if (dt < best) best = dt;
    }
    return best;
}

int main() {
    std::mt19937_64 rng(7);
    // Build a split table like BulletproofGens.split_table(64, 1): 130 base
    // points -> 520 entries.  Point values don't matter for timing (complete
    // formulas); derive them by walking multiples of the STARK generator.
    size_t base_n = 130;
    std::vector<u8> xs(32 * base_n), ys(32 * base_n), inf(base_n, 0);
    static const u8 GEN_X_LE[32] = {
        0xca,0xcf,0x43,0xc9,0x8b,0x3d,0x72,0x3d,0xe0,0x19,0x18,0x0d,0x9b,0xfd,
        0xac,0xde,0xc7,0xf0,0x40,0x5a,0x41,0xed,0xec,0x7b,0x1b,0x97,0x99,0x85,
        0xc1,0x15,0xef,0x01};
    static const u8 GEN_Y_LE[32] = {
        0x1f,0xdc,0xe8,0x36,0x0c,0x00,0x73,0x28,0xa3,0x43,0xbe,0x1a,0xd1,0xec,
        0x53,0xde,0x62,0xec,0x46,0xdf,0x01,0x48,0xbe,0xb7,0x30,0x97,0xa4,0x0a,
        0x06,0x68,0x56,0x00};
    Pt g;
    fp_from_bytes(g.X, GEN_X_LE);
    fp_from_bytes(g.Y, GEN_Y_LE);
    g.Z = FP_ONE;
    std::vector<Pt> pts_j(base_n);
    Pt cur = g;
    for (size_t i = 0; i < base_n; ++i) {
        pts_j[i] = cur;
        Pt t;
        pt_dbl(t, cur);
        Pt t2;
        pt_add(t2, t, g);
        cur = t2;
    }
    std::vector<AffinePt> base_aff(base_n);
    pts_to_affine_fp(base_aff.data(), pts_j.data(), base_n);
    for (size_t i = 0; i < base_n; ++i) {
        AffinePt &a = base_aff[i];
        fp_to_bytes(xs.data() + 32 * i, a.x);
        fp_to_bytes(ys.data() + 32 * i, a.y);
        inf[i] = a.inf;
        // NOTE: fp_to_bytes converts out of Montgomery; bp_points_new_split
        // expects canonical LE bytes, so this round-trips correctly.
    }
    PointTable *table = (PointTable *)bp_points_new_split(
        xs.data(), ys.data(), inf.data(), base_n);

    size_t k = 65;  // IPP round MSM width at n=64 (+Q term)
    std::vector<u8> scl(32 * k);
    for (auto &b : scl) b = (u8)rng();
    for (size_t i = 0; i < k; ++i) scl[32 * i + 31] &= 0x03;  // < 2^250
    std::vector<u32> idx(k);
    for (size_t i = 0; i < k; ++i) idx[i] = (u32)(i % (2 * 64 + 2));

    std::vector<u8> s4;
    std::vector<u32> i4;
    expand_split4(scl.data(), idx.data(), k, table->base_n, s4, i4);
    size_t k4 = 4 * k;

    unsigned hw = std::thread::hardware_concurrency();
    int nthreads = (int)(hw ? hw : 1);
    printf("threads=%d k4=%zu\n", nthreads, k4);

#ifdef BP_HAVE_IFMA
    const u64 *fe52 = table->fe52.data();
    int c, parts;
    msm_pick_c_parts_ifma(k4, 1, nthreads, 64, &c, &parts);
    int windows = (64 + c - 1) / c;
    printf("picker: c=%d parts=%d windows=%d\n", c, parts, windows);

    u8 ox[32], oy[32], oi;
    double t_full = best_of(200, [&] {
        MsmJob job{s4.data(), i4.data(), ox, oy, &oi};
        msm_run_ifma_jobs(&job, 1, table->pts, fe52, k4, 64, nthreads);
    });
    printf("full single msm (pool):   %8.1f us\n", t_full);

    double t_full1 = best_of(200, [&] {
        MsmJob job{s4.data(), i4.data(), ox, oy, &oi};
        msm_run_ifma_jobs(&job, 1, table->pts, fe52, k4, 64, 1);
    });
    printf("full single msm (1 thr):  %8.1f us\n", t_full1);

    // pair, as the IPP round does
    std::vector<u8> s4b = s4;
    u8 ox2[32], oy2[32], oi2;
    double t_pair = best_of(200, [&] {
        MsmJob jobs[2] = {{s4.data(), i4.data(), ox, oy, &oi},
                          {s4b.data(), i4.data(), ox2, oy2, &oi2}};
        msm_run_ifma_jobs(jobs, 2, table->pts, fe52, k4, 64, nthreads);
    });
    printf("pair msm (pool):          %8.1f us\n", t_pair);

    // empirical c sweep at pair shape (what the picker should choose)
    for (size_t kk : {130ul, 260ul, 516ul, 1028ul}) {
        std::vector<u8> sv(32 * kk);
        for (auto &b : sv) b = (u8)rng();
        std::vector<u32> iv(kk);
        for (size_t i = 0; i < kk; ++i) iv[i] = (u32)(i % table->pts.size());
        for (int cc = 3; cc <= 9; ++cc) {
            int ws = (64 + cc - 1) / cc;
            std::vector<Pt> wout(ws);
            double t = best_of(60, [&] {
                for (int w0 = 0; w0 < ws; w0 += 8) {
                    int nl = ws - w0 < 8 ? ws - w0 : 8;
                    msm_window_group_ifma(sv.data(), iv.data(), table->pts,
                                          fe52, kk, cc, w0, nl, wout.data());
                }
            });
            printf("  sweep k4=%4zu c=%d (w=%2d): %8.1f us serial\n", kk, cc, ws, t);
        }
    }

    // bucket phase alone (all window groups of <= 8 lanes, serial)
    std::vector<Pt> wsums(windows);
    double t_bucket = best_of(200, [&] {
        for (int w0 = 0; w0 < windows; w0 += 8) {
            int nl = windows - w0 < 8 ? windows - w0 : 8;
            msm_window_group_ifma(s4.data(), i4.data(), table->pts, fe52, k4,
                                  c, w0, nl, wsums.data());
        }
    });
    printf("bucket all-windows 1thr:  %8.1f us\n", t_bucket);

    // combine alone
    double t_comb = best_of(200, [&] {
        msm_combine(wsums.data(), windows, c, ox, oy, &oi);
    });
    printf("combine (%d dbl + aff):   %8.1f us\n", 64, t_comb);

    // affine conversion alone
    Pt one = wsums[0];
    double t_aff = best_of(200, [&] { pt_to_affine(ox, oy, &oi, one); });
    printf("pt_to_affine (fp_inv):    %8.1f us\n", t_aff);

    // fr_inv
    Fr u, ui;
    for (int i = 0; i < 4; ++i) u.v[i] = rng();
    u.v[3] &= 0x03FFFFFFFFFFFFFFull;
    double t_frinv = best_of(200, [&] { fr_inv(ui, u); });
    printf("fr_inv:                   %8.1f us\n", t_frinv);

    // pool dispatch overhead: empty 4-task parallel_for
    double t_pool = best_of(200, [&] {
        parallel_for(4, nthreads, [&](size_t) {});
    });
    printf("pool 4-task dispatch:     %8.1f us\n", t_pool);

    // keccak absorb (transcript block per round: 2 points + challenge)
    Transcript tr;
    memset(tr.state, 7, 32);
    double t_tr = best_of(200, [&] {
        tr_append_point_affine(tr, (const u8 *)"L", 1, ox, oy, 0);
        tr_append_point_affine(tr, (const u8 *)"R", 1, ox, oy, 0);
        Fr uu;
        tr_challenge_scalar(tr, (const u8 *)"u", 1, uu);
    });
    printf("transcript round block:   %8.1f us\n", t_tr);
#else
    printf("no IFMA\n");
#endif
    return 0;
}
