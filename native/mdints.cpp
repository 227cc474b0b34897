// McMurchie-Davidson two-electron integrals (native engine).
//
// C++ counterpart of pycc_tpu/scf/integrals.py's eri(): the reference
// framework outsources integral generation to Psi4's C++ core; pycc_tpu
// ships this engine instead.  Computes (ab|cd) blocks over raw cartesian
// shells in the (l,0,0)-normalized primitive convention; the Python layer
// applies cartesian->spherical transforms and scatters into the final AO
// ordering.
//
// Entry points:
//   md_eri        — full (ab|cd) tensor (small systems / oracle path)
//   md_ctx_new    — persistent shell-pair context for the direct paths
//   md_eri_diag   — per-shell-pair diagonal blocks (ij|ij) (pivots/Schwarz)
//   md_eri_cols   — (ab|kl) for ALL bra pairs at one fixed ket shell pair:
//                   the column batches that drive the integral-direct
//                   pivoted-Cholesky factorization (scf/df.py) without
//                   ever materializing the nao^4 tensor
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmdints.so mdints.cpp

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr double PI = 3.14159265358979323846;

// ---------------------------------------------------------------- Boys
// F_m(T) for m = 0..mmax, double precision.
void boys(int mmax, double T, double* F) {
    if (T < 1e-13) {
        for (int m = 0; m <= mmax; ++m) F[m] = 1.0 / (2 * m + 1) - T / (2 * m + 3);
        return;
    }
    if (T > 35.0) {
        // asymptotic + downward recursion
        F[0] = 0.5 * std::sqrt(PI / T);
        for (int m = 1; m <= mmax; ++m) F[m] = F[m - 1] * (2 * m - 1) / (2.0 * T);
        return;
    }
    // series for F_mmax, then downward recursion
    // term_0 = 1/(2m+1); term_k = term_{k-1} * 2T/(2m+2k+1)
    double e = std::exp(-T);
    double t0 = 1.0 / (2 * mmax + 1);
    double sum = t0;
    double tk = t0;
    for (int k = 1; k < 300; ++k) {
        tk *= 2.0 * T / (2 * mmax + 2 * k + 1);
        sum += tk;
        if (tk < 1e-17 * sum) break;
    }
    F[mmax] = e * sum;
    for (int m = mmax - 1; m >= 0; --m)
        F[m] = (2.0 * T * F[m + 1] + e) / (2 * m + 1);
}

// ------------------------------------------------- Hermite E coefficients
// E[i][j][t] for one dimension, one primitive pair.
struct Etab {
    int la, lb;
    std::vector<double> v;  // (la+1)*(lb+1)*(la+lb+1)
    double& at(int i, int j, int t) { return v[(i * (lb + 1) + j) * (la + lb + 1) + t]; }
    double at(int i, int j, int t) const { return v[(i * (lb + 1) + j) * (la + lb + 1) + t]; }
};

Etab hermite_E(int la, int lb, double p, double PA, double PB, double K) {
    Etab E;
    E.la = la; E.lb = lb;
    int tmax = la + lb;
    std::vector<double> work((la + 1) * (lb + 1) * (tmax + 2), 0.0);
    auto W = [&](int i, int j, int t) -> double& {
        return work[(i * (lb + 1) + j) * (tmax + 2) + t];
    };
    W(0, 0, 0) = K;
    double inv2p = 0.5 / p;
    for (int i = 0; i <= la; ++i) {
        for (int j = 0; j <= lb; ++j) {
            if (i == 0 && j == 0) continue;
            if (j == 0) {
                for (int t = 0; t <= i + j; ++t) {
                    double val = PA * W(i - 1, 0, t);
                    if (t > 0) val += inv2p * W(i - 1, 0, t - 1);
                    val += (t + 1) * W(i - 1, 0, t + 1);
                    W(i, 0, t) = val;
                }
            } else {
                for (int t = 0; t <= i + j; ++t) {
                    double val = PB * W(i, j - 1, t);
                    if (t > 0) val += inv2p * W(i, j - 1, t - 1);
                    val += (t + 1) * W(i, j - 1, t + 1);
                    W(i, j, t) = val;
                }
            }
        }
    }
    E.v.assign((la + 1) * (lb + 1) * (tmax + 1), 0.0);
    for (int i = 0; i <= la; ++i)
        for (int j = 0; j <= lb; ++j)
            for (int t = 0; t <= tmax; ++t)
                E.at(i, j, t) = W(i, j, t);
    return E;
}

// cartesian component list for angular momentum l (alphabetical order)
struct Cart { int x, y, z; };
std::vector<Cart> cart_components(int l) {
    std::vector<Cart> out;
    for (int i = l; i >= 0; --i)
        for (int j = l - i; j >= 0; --j)
            out.push_back({i, j, l - i - j});
    return out;
}

// Hermite (t,u,v) list in total-order-major layout
std::vector<Cart> hermite_list(int L) {
    std::vector<Cart> out;
    for (int s = 0; s <= L; ++s)
        for (int t = s; t >= 0; --t)
            for (int u = s - t; u >= 0; --u)
                out.push_back({t, u, s - t - u});
    return out;
}

struct PrimPair {
    double p;            // a + b
    double P[3];
    double coef;         // c_a * c_b
};

struct ShellPairData {
    int sa, sb;          // shell indices
    int L;               // la + lb
    int ncab;            // ncart_a * ncart_b
    int nh;              // hermite count
    std::vector<PrimPair> pp;
    std::vector<double> theta;     // [npp][ncab][nh], coef folded in
    std::vector<double> thetamax;  // per-prim-pair max |theta| (screening)
};

// persistent context for the integral-direct paths
struct Ctx {
    int nshell, ncart_tot, maxL;
    std::vector<int> ls, cart_off;
    std::vector<ShellPairData> pairs;           // i >= j
    std::vector<std::vector<Cart>> hl_by_L;     // hermite lists per L
};

ShellPairData build_pair(int i, int j, const int* ls, const int* nprim,
                         const int* poff, const double* exps,
                         const double* coefs, const double* centers) {
    ShellPairData sp;
    sp.sa = i; sp.sb = j;
    int la = ls[i], lb = ls[j];
    sp.L = la + lb;
    auto ca = cart_components(la);
    auto cb = cart_components(lb);
    auto hl = hermite_list(sp.L);
    sp.ncab = (int)(ca.size() * cb.size());
    sp.nh = (int)hl.size();
    const double* A = centers + 3 * i;
    const double* B = centers + 3 * j;
    for (int ka = 0; ka < nprim[i]; ++ka) {
        for (int kb = 0; kb < nprim[j]; ++kb) {
            double a = exps[poff[i] + ka];
            double b = exps[poff[j] + kb];
            double p = a + b;
            PrimPair q;
            q.p = p;
            for (int d = 0; d < 3; ++d)
                q.P[d] = (a * A[d] + b * B[d]) / p;
            q.coef = coefs[poff[i] + ka] * coefs[poff[j] + kb];
            // E tensors per dimension
            Etab E[3];
            for (int d = 0; d < 3; ++d) {
                double K = std::exp(-a * b / p * (A[d] - B[d]) * (A[d] - B[d]));
                E[d] = hermite_E(la, lb, p, q.P[d] - A[d], q.P[d] - B[d], K);
            }
            // theta block for this primitive pair
            size_t base = sp.theta.size();
            sp.theta.resize(base + (size_t)sp.ncab * sp.nh, 0.0);
            for (size_t ia = 0; ia < ca.size(); ++ia) {
                for (size_t ib = 0; ib < cb.size(); ++ib) {
                    size_t idx = ia * cb.size() + ib;
                    for (int h = 0; h < sp.nh; ++h) {
                        Cart tuv = hl[h];
                        if (tuv.x > ca[ia].x + cb[ib].x ||
                            tuv.y > ca[ia].y + cb[ib].y ||
                            tuv.z > ca[ia].z + cb[ib].z) continue;
                        double val = E[0].at(ca[ia].x, cb[ib].x, tuv.x)
                                   * E[1].at(ca[ia].y, cb[ib].y, tuv.y)
                                   * E[2].at(ca[ia].z, cb[ib].z, tuv.z);
                        sp.theta[base + idx * sp.nh + h] = val * q.coef;
                    }
                }
            }
            double tmax = 0.0;
            for (size_t t = base; t < sp.theta.size(); ++t)
                tmax = std::max(tmax, std::abs(sp.theta[t]));
            sp.thetamax.push_back(tmax);
            sp.pp.push_back(q);
        }
    }
    return sp;
}

Ctx* build_ctx(int nshell, const int* ls, const int* nprim, const int* poff,
               const double* exps, const double* coefs, const double* centers,
               const int* cart_off, int ncart_tot) {
    Ctx* c = new Ctx();
    c->nshell = nshell;
    c->ncart_tot = ncart_tot;
    c->ls.assign(ls, ls + nshell);
    c->cart_off.assign(cart_off, cart_off + nshell);
    int maxL = 0;
    for (int i = 0; i < nshell; ++i) maxL = std::max(maxL, ls[i]);
    c->maxL = maxL;
    for (int L = 0; L <= 2 * maxL; ++L)
        c->hl_by_L.push_back(hermite_list(L));
    for (int i = 0; i < nshell; ++i)
        for (int j = 0; j <= i; ++j)
            c->pairs.push_back(build_pair(i, j, ls, nprim, poff, exps,
                                          coefs, centers));
    return c;
}

// (P1 | P2) cartesian block: blk must hold P1.ncab * P2.ncab doubles.
void compute_block(const Ctx& ctx, const ShellPairData& P1,
                   const ShellPairData& P2, double* blk,
                   double primtol = 0.0) {
    const auto& hl1 = ctx.hl_by_L[P1.L];
    const auto& hl2 = ctx.hl_by_L[P2.L];
    int Ltot = P1.L + P2.L;
    std::memset(blk, 0, sizeof(double) * (size_t)P1.ncab * P2.ncab);
    std::vector<double> Rn((size_t)(Ltot + 1) * (Ltot + 1) * (Ltot + 1) * (Ltot + 1));
    std::vector<double> Fm(Ltot + 1);
    auto Rat = [&](std::vector<double>& arr, int n, int t, int u, int v) -> double& {
        return arr[(((size_t)n * (Ltot + 1) + t) * (Ltot + 1) + u) * (Ltot + 1) + v];
    };
    for (const PrimPair& qp1 : P1.pp) {
        size_t i1 = &qp1 - &P1.pp[0];
        for (const PrimPair& qp2 : P2.pp) {
            size_t i2 = &qp2 - &P2.pp[0];
            double pref = 2.0 * std::pow(PI, 2.5)
                / (qp1.p * qp2.p * std::sqrt(qp1.p + qp2.p));
            // primitive screening: theta carries exp(-mu AB^2) * coef, so
            // a vanishing product bounds every quartet in this prim pair
            if (primtol > 0.0 &&
                P1.thetamax[i1] * P2.thetamax[i2] * pref < primtol)
                continue;
            double alpha = qp1.p * qp2.p / (qp1.p + qp2.p);
            double PQ[3] = {qp1.P[0] - qp2.P[0], qp1.P[1] - qp2.P[1],
                            qp1.P[2] - qp2.P[2]};
            double T = alpha * (PQ[0] * PQ[0] + PQ[1] * PQ[1] + PQ[2] * PQ[2]);
            boys(Ltot, T, Fm.data());
            // build R^n_{tuv} recursion
            std::fill(Rn.begin(), Rn.end(), 0.0);
            double sgn = 1.0;
            for (int n = 0; n <= Ltot; ++n) {
                Rat(Rn, n, 0, 0, 0) = sgn * Fm[n];
                sgn *= -2.0 * alpha;
            }
            for (int s = 1; s <= Ltot; ++s) {
                for (int t = std::min(s, Ltot); t >= 0; --t) {
                    for (int u = std::min(s - t, Ltot); u >= 0; --u) {
                        int v = s - t - u;
                        if (v < 0 || v > Ltot) continue;
                        for (int n = 0; n <= Ltot - s; ++n) {
                            double val;
                            if (v > 0) {
                                val = PQ[2] * Rat(Rn, n + 1, t, u, v - 1);
                                if (v > 1) val += (v - 1) * Rat(Rn, n + 1, t, u, v - 2);
                            } else if (u > 0) {
                                val = PQ[1] * Rat(Rn, n + 1, t, u - 1, v);
                                if (u > 1) val += (u - 1) * Rat(Rn, n + 1, t, u - 2, v);
                            } else {
                                val = PQ[0] * Rat(Rn, n + 1, t - 1, u, v);
                                if (t > 1) val += (t - 1) * Rat(Rn, n + 1, t - 2, u, v);
                            }
                            Rat(Rn, n, t, u, v) = val;
                        }
                    }
                }
            }
            // contract: blk[ab,cd] += pref * theta1[ab,h1] * sign2 * theta2[cd,h2] * R[h1+h2]
            const double* th1 = &P1.theta[i1 * (size_t)P1.ncab * P1.nh];
            const double* th2 = &P2.theta[i2 * (size_t)P2.ncab * P2.nh];
            for (int ab = 0; ab < P1.ncab; ++ab) {
                for (int h1 = 0; h1 < P1.nh; ++h1) {
                    double t1v = th1[ab * P1.nh + h1] * pref;
                    if (t1v == 0.0) continue;
                    Cart c1 = hl1[h1];
                    for (int cd = 0; cd < P2.ncab; ++cd) {
                        double acc = 0.0;
                        for (int h2 = 0; h2 < P2.nh; ++h2) {
                            double t2v = th2[cd * P2.nh + h2];
                            if (t2v == 0.0) continue;
                            Cart c2 = hl2[h2];
                            double rv = Rat(Rn, 0, c1.x + c2.x, c1.y + c2.y, c1.z + c2.z);
                            double s = ((c2.x + c2.y + c2.z) & 1) ? -1.0 : 1.0;
                            acc += t2v * s * rv;
                        }
                        blk[(size_t)ab * P2.ncab + cd] += t1v * acc;
                    }
                }
            }
        }
    }
}

}  // namespace

extern "C" int md_eri(
    int nshell,
    const int* ls,
    const int* nprim,
    const int* poff,
    const double* exps,
    const double* coefs,
    const double* centers,
    const int* cart_off,
    int ncart_tot,
    double* out) {

    Ctx* ctx = build_ctx(nshell, ls, nprim, poff, exps, coefs, centers,
                         cart_off, ncart_tot);
    const auto& pairs = ctx->pairs;

    size_t N = (size_t)ncart_tot;
    auto idx4 = [N](size_t a, size_t b, size_t c, size_t d) {
        return ((a * N + b) * N + c) * N + d;
    };

    std::vector<double> blk;
    for (size_t pi = 0; pi < pairs.size(); ++pi) {
        const ShellPairData& P1 = pairs[pi];
        auto ca1 = cart_components(ls[P1.sa]);
        auto cb1 = cart_components(ls[P1.sb]);
        for (size_t qi = 0; qi <= pi; ++qi) {
            const ShellPairData& P2 = pairs[qi];
            blk.resize((size_t)P1.ncab * P2.ncab);
            compute_block(*ctx, P1, P2, blk.data());
            // scatter 8 permutational images
            int oa = cart_off[P1.sa], ob = cart_off[P1.sb];
            int oc = cart_off[P2.sa], od = cart_off[P2.sb];
            int na = (int)ca1.size(), nb = (int)cb1.size();
            auto ca2 = cart_components(ls[P2.sa]);
            auto cb2 = cart_components(ls[P2.sb]);
            int nc = (int)ca2.size(), nd = (int)cb2.size();
            for (int a = 0; a < na; ++a)
                for (int b = 0; b < nb; ++b)
                    for (int c = 0; c < nc; ++c)
                        for (int d = 0; d < nd; ++d) {
                            double val = blk[(size_t)(a * nb + b) * P2.ncab + c * nd + d];
                            size_t A_ = oa + a, B_ = ob + b, C_ = oc + c, D_ = od + d;
                            out[idx4(A_, B_, C_, D_)] = val;
                            out[idx4(B_, A_, C_, D_)] = val;
                            out[idx4(A_, B_, D_, C_)] = val;
                            out[idx4(B_, A_, D_, C_)] = val;
                            out[idx4(C_, D_, A_, B_)] = val;
                            out[idx4(D_, C_, A_, B_)] = val;
                            out[idx4(C_, D_, B_, A_)] = val;
                            out[idx4(D_, C_, B_, A_)] = val;
                        }
        }
    }
    delete ctx;
    return 0;
}

// --------------------------------------------------------------------------
// persistent-context API (integral-direct Cholesky driver, scf/df.py)
// --------------------------------------------------------------------------

extern "C" void* md_ctx_new(
    int nshell, const int* ls, const int* nprim, const int* poff,
    const double* exps, const double* coefs, const double* centers,
    const int* cart_off, int ncart_tot) {
    return (void*)build_ctx(nshell, ls, nprim, poff, exps, coefs, centers,
                            cart_off, ncart_tot);
}

extern "C" void md_ctx_free(void* h) { delete (Ctx*)h; }

extern "C" int md_ctx_npairs(void* h) { return (int)((Ctx*)h)->pairs.size(); }

// shell indices (i >= j) of pair `p`
extern "C" int md_ctx_pair(void* h, int p, int* i, int* j) {
    Ctx* c = (Ctx*)h;
    if (p < 0 || p >= (int)c->pairs.size()) return 1;
    *i = c->pairs[p].sa;
    *j = c->pairs[p].sb;
    return 0;
}

// diagonal blocks (p|p) for every shell pair, concatenated in pair order;
// block p occupies ncab_p^2 doubles.  Drives Cholesky pivots + Schwarz.
extern "C" int md_eri_diag(void* h, double* out) {
    Ctx* c = (Ctx*)h;
    size_t off = 0;
    for (const auto& P : c->pairs) {
        compute_block(*c, P, P, out + off);
        off += (size_t)P.ncab * P.ncab;
    }
    return 0;
}

// (ab|kl) for ALL bra shell pairs at the fixed ket pair `kp`:
// out has shape (ncart_tot, ncart_tot, ncab_ket), both (a,b) and (b,a)
// bra images scattered.  `schwarz` (len npairs) are per-pair
// sqrt(max diag) bounds; bra pairs with schwarz[bra]*schwarz[ket] < thresh
// are skipped (their out entries left as zero) — callers must pre-zero out.
extern "C" int md_eri_cols(void* h, int kp, const double* schwarz,
                           double thresh, double* out) {
    Ctx* c = (Ctx*)h;
    if (kp < 0 || kp >= (int)c->pairs.size()) return 1;
    const ShellPairData& K = c->pairs[kp];
    size_t N = (size_t)c->ncart_tot;
    size_t nck = (size_t)K.ncab;
    double sk = schwarz ? schwarz[kp] : 1.0;
    std::vector<double> blk;
    for (size_t pi = 0; pi < c->pairs.size(); ++pi) {
        const ShellPairData& P = c->pairs[pi];
        if (schwarz && schwarz[pi] * sk < thresh) continue;
        blk.resize((size_t)P.ncab * K.ncab);
        compute_block(*c, P, K, blk.data(), thresh * 1e-2);
        int oa = c->cart_off[P.sa], ob = c->cart_off[P.sb];
        auto ca = cart_components(c->ls[P.sa]);
        auto cb = cart_components(c->ls[P.sb]);
        int na = (int)ca.size(), nb = (int)cb.size();
        for (int a = 0; a < na; ++a)
            for (int b = 0; b < nb; ++b) {
                const double* src = &blk[(size_t)(a * nb + b) * nck];
                double* d1 = out + ((size_t)(oa + a) * N + (ob + b)) * nck;
                std::memcpy(d1, src, sizeof(double) * nck);
                if (oa + a != ob + b) {
                    double* d2 = out + ((size_t)(ob + b) * N + (oa + a)) * nck;
                    std::memcpy(d2, src, sizeof(double) * nck);
                }
            }
    }
    return 0;
}
