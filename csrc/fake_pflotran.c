/* fake_pflotran — compiled stand-in for the external PFLOTRAN binary,
 * used by benchmarks/cli_journey.py to drive the full-scale CLI journey
 * (5,076 forward runs) at native speed on the 1-core host (the Python
 * stub costs ~0.7 s/run in interpreter+numpy startup alone; this is
 * ~25 ms/run).
 *
 * Behavior-identical contract to the Python stub in cli_journey.py:
 *   argv: ... -pflotranin <prefix>_<idx>.in
 *   1. parse the 29-parameter splice back out of the .in (exact-token
 *      keyword match with occurrence counting, mirroring
 *      ertdx.physics.PflotranSimulator keyword mode; parameter 28 never
 *      enters the file — unidentifiable by construction),
 *   2. unit-scale (log10 for log-distributed params) against the bounds
 *      in operator.bin, respond through the low-rank linear operator,
 *   3. write 14 reference-format .srv files: 259 header lines, value in
 *      column 5 (0-based), day-stamped names <stem>-E1-<10(s+1)>d.srv.
 *
 * operator.bin layout (all little-endian doubles after 4 int64 dims):
 *   int64 L, C, K, P; lo[P]; hi[P]; logmask[P]; basis[P*K] (row-major);
 *   waves[L*K] (row-major); chan[C]
 *
 * Reference being faked: the mpirun pflotran invocation at
 * Generate_ERT_utils.py:393-405, 448-460.
 */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define NP 29

/* xorshift64* PRNG + Box-Muller: deterministic per-sim noise */
static uint64_t rng_state;
static double rng_uniform(void) {
    uint64_t x = rng_state;
    x ^= x >> 12; x ^= x << 25; x ^= x >> 27;
    rng_state = x;
    return (double)(x * 0x2545F4914F6CDD1DULL >> 11) / 9007199254740992.0;
}
static double rng_normal(void) {
    double u1 = rng_uniform(), u2 = rng_uniform();
    if (u1 < 1e-300) u1 = 1e-300;
    return sqrt(-2.0 * log(u1)) * cos(2.0 * M_PI * u2);
}

typedef struct { const char *kw; const int *slots; int n; } KeyRule;

int main(int argc, char **argv) {
    const char *inpath = NULL;
    for (int i = 1; i + 1 < argc; i++)
        if (strcmp(argv[i], "-pflotranin") == 0) inpath = argv[i + 1];
    if (!inpath) { fprintf(stderr, "no -pflotranin\n"); return 2; }

    /* operator.bin sits next to this executable */
    char opath[4096];
    strncpy(opath, argv[0], sizeof(opath) - 32);
    opath[sizeof(opath) - 32] = 0;
    char *slash = strrchr(opath, '/');
    strcpy(slash ? slash + 1 : opath, "operator.bin");
    FILE *op = fopen(opath, "rb");
    if (!op) { fprintf(stderr, "missing %s\n", opath); return 2; }
    int64_t dims[4];
    if (fread(dims, sizeof(int64_t), 4, op) != 4) return 2;
    int64_t L = dims[0], C = dims[1], K = dims[2], P = dims[3];
    if (P != NP) { fprintf(stderr, "bad P\n"); return 2; }
    double *lo = malloc(P * sizeof(double)),
           *hi = malloc(P * sizeof(double)),
           *lg = malloc(P * sizeof(double)),
           *basis = malloc(P * K * sizeof(double)),
           *waves = malloc(L * K * sizeof(double)),
           *chan = malloc(C * sizeof(double));
    if (fread(lo, 8, P, op) != (size_t)P || fread(hi, 8, P, op) != (size_t)P
        || fread(lg, 8, P, op) != (size_t)P
        || fread(basis, 8, P * K, op) != (size_t)(P * K)
        || fread(waves, 8, L * K, op) != (size_t)(L * K)
        || fread(chan, 8, C, op) != (size_t)C) return 2;
    fclose(op);

    /* ---- parse the parameter splice back out of the .in ---- */
    static const int s_por[] = {0, 6, 12}, s_px[] = {1, 7, 13},
        s_ace[] = {3, 9, 15}, s_ase[] = {4, 10, 16}, s_atc[] = {5, 11, 17},
        s_sec[] = {24, 25, 26}, s_alpha[] = {18, 21},
        s_m[] = {19, 19, 22, 22}, s_lrs[] = {20, 20, 23, 23},
        s_wc[] = {27};
    const KeyRule rules[] = {
        {"POROSITY", s_por, 3}, {"PERM_X", s_px, 3},
        {"ARCHIE_CEMENTATION_EXPONENT", s_ace, 3},
        {"ARCHIE_SATURATION_EXPONENT", s_ase, 3},
        {"ARCHIE_TORTUOSITY_CONSTANT", s_atc, 3},
        {"SURFACE_ELECTRICAL_CONDUCTIVITY", s_sec, 3},
        {"ALPHA", s_alpha, 2}, {"M", s_m, 4},
        {"LIQUID_RESIDUAL_SATURATION", s_lrs, 4},
        {"WATER_CONDUCTIVITY", s_wc, 1},
    };
    int seen[10] = {0};
    int seen_pz = 0;
    double p[NP], permz[3];
    for (int i = 0; i < NP; i++) p[i] = NAN;

    FILE *in = fopen(inpath, "r");
    if (!in) { fprintf(stderr, "cannot open %s\n", inpath); return 2; }
    char line[8192];
    while (fgets(line, sizeof(line), in)) {
        char kw[128];
        double val;
        if (sscanf(line, " %127s %lf", kw, &val) != 2) continue;
        if (strcmp(kw, "PERM_Z") == 0) {
            if (seen_pz < 3) permz[seen_pz++] = val;
            continue;
        }
        for (size_t r = 0; r < sizeof(rules) / sizeof(rules[0]); r++) {
            if (strcmp(kw, rules[r].kw) != 0) continue;
            int occ = seen[r]++;
            if (occ < rules[r].n) p[rules[r].slots[occ]] = val;
            break;
        }
    }
    fclose(in);
    for (int m = 0; m < seen_pz; m++)              /* ratio = PERM_Z/PERM_X */
        p[2 + 6 * m] = permz[m] / p[1 + 6 * m];
    p[28] = 0.5 * (lo[28] + hi[28]);               /* never spliced (ref) */
    for (int i = 0; i < NP; i++)
        if (isnan(p[i])) { fprintf(stderr, "unparsed p[%d]\n", i); return 3; }

    /* ---- z = unit-scaled - 0.5; coef = basis^T z; sig = waves coef ---- */
    double z[NP];
    for (int i = 0; i < NP; i++) {
        double x = lg[i] > 0.5 ? log10(p[i]) : p[i];
        double a = lg[i] > 0.5 ? log10(lo[i]) : lo[i];
        double b = lg[i] > 0.5 ? log10(hi[i]) : hi[i];
        z[i] = (x - a) / (b - a) - 0.5;
    }
    double coef[64];
    for (int k = 0; k < K; k++) {
        coef[k] = 0.0;
        for (int i = 0; i < NP; i++) coef[k] += basis[i * K + k] * z[i];
    }
    double *sig = malloc(L * sizeof(double));
    for (int64_t l = 0; l < L; l++) {
        double s = 0.0;
        for (int k = 0; k < K; k++) s += waves[l * K + k] * coef[k];
        sig[l] = s;
    }

    /* ---- 14 .srv files: 259 header lines + L data rows ---- */
    char stem[4096];
    strncpy(stem, inpath, sizeof(stem) - 64);
    stem[sizeof(stem) - 64] = 0;
    size_t n = strlen(stem);
    if (n > 3 && strcmp(stem + n - 3, ".in") == 0) stem[n - 3] = 0;
    const char *us = strrchr(stem, '_');
    long idx = us ? strtol(us + 1, NULL, 10) : 0;
    rng_state = 0x9E3779B97F4A7C15ULL ^ (uint64_t)(10000 + idx);
    rng_uniform();                                  /* warm the state */

    char out[4352];
    for (int64_t s = 0; s < C; s++) {
        snprintf(out, sizeof(out), "%s-E1-%dd.srv", stem,
                 (int)(10 * (s + 1)));
        FILE *f = fopen(out, "w");
        if (!f) { fprintf(stderr, "cannot write %s\n", out); return 4; }
        for (int h = 0; h < 259; h++) fprintf(f, "# header %d\n", h);
        for (int64_t l = 0; l < L; l++) {
            double v = 50.0 + 10.0 * sig[l] * chan[s]
                       + 0.2 * rng_normal();
            fprintf(f, "%lld 0 0 0 0 %.6e\n", (long long)(l + 1), v);
        }
        fclose(f);
    }
    return 0;
}
