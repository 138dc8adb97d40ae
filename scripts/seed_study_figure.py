"""Render the 10-seed flagship robustness figure for RESULTS.md.

Data: RESULTS.md "Preset v2 measured — the complete 10-seed table"
(queue13 + queue14, histories results/flagship_replication/). Per seed:
held-out clean consistency under the plain flagship recipe vs the
shipping `--preset flagship` (v2: L1 logit brake + strict restart).
Dumbbell form (paired before/after across 10 categories); distribution
floors as dashed rules. Colors are the validated reference palette
slots 1-2 (adjacent-pair CVD-safe); identity is double-encoded by
marker shape so the pairing survives grayscale.

Usage: python scripts/seed_study_figure.py
Writes results/flagship_replication/seed_study.png
"""
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

SEEDS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
# plain flagship recipe, held-out clean where measured (seeds 1,2,5,10),
# selection-time clean otherwise (the plain runs predate the held-out
# protocol; RESULTS.md table column 2).
PLAIN = [0.962, 0.826, 0.915, 0.897, 0.128, 0.915, 0.831, 0.974, 0.923, 0.308]
# preset v2 held-out clean (RESULTS.md table column 3).
V2 = [0.874, 0.913, 0.964, 0.797, 0.764, 0.851, 0.872, 0.923, 0.849, 0.977]

BLUE = "#2a78d6"   # series 1: preset v2 (shipping)
ORANGE = "#eb6834"  # series 2: plain recipe
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e6e5e2"
SURFACE = "#fcfcfb"

fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=160)
fig.patch.set_facecolor(SURFACE)
ax.set_facecolor(SURFACE)

x = range(len(SEEDS))
for xi, p, v in zip(x, PLAIN, V2):
    ax.plot([xi, xi], [p, v], color=GRID, lw=2, zorder=1)
ax.scatter(x, PLAIN, s=64, color=ORANGE, marker="o", zorder=3,
           label="plain flagship recipe")
ax.scatter(x, V2, s=80, color=BLUE, marker="D", zorder=3,
           label="--preset flagship (v2: brake + strict restart)")

ax.axhline(min(PLAIN), color=ORANGE, lw=1.2, ls=(0, (4, 3)), zorder=2)
ax.axhline(min(V2), color=BLUE, lw=1.2, ls=(0, (4, 3)), zorder=2)
ax.annotate(f"plain floor {min(PLAIN):.3f}", xy=(6.5, min(PLAIN)),
            xytext=(0, 5), textcoords="offset points", ha="center",
            fontsize=8, color=INK2)
ax.annotate(f"v2 floor {min(V2):.3f}", xy=(9.45, min(V2)),
            xytext=(0, 5), textcoords="offset points", ha="right",
            fontsize=8, color=INK2)

# direct-label the two seeds the hardening was built for
ax.annotate("basin failure", xy=(4, PLAIN[4]), xytext=(10, -3),
            textcoords="offset points", ha="left",
            fontsize=7.5, color=INK2)
ax.annotate("marginal basin", xy=(9, PLAIN[9]), xytext=(-10, -3),
            textcoords="offset points", ha="right",
            fontsize=7.5, color=INK2)

ax.set_xticks(list(x), [str(s) for s in SEEDS])
ax.set_xlabel("seed", color=INK2, fontsize=9)
ax.set_ylabel("held-out clean consistency", color=INK2, fontsize=9)
ax.set_ylim(0.0, 1.05)
ax.set_xlim(-0.6, 9.6)
ax.set_title("Flagship robustness across 10 seeds: hardening lifts the floor "
             f"{min(PLAIN):.3f} → {min(V2):.3f}",
             fontsize=10.5, color=INK, loc="left", pad=12)
ax.tick_params(colors=INK2, labelsize=8.5)
for s in ("top", "right"):
    ax.spines[s].set_visible(False)
for s in ("left", "bottom"):
    ax.spines[s].set_color(GRID)
ax.grid(axis="y", color=GRID, lw=0.7, zorder=0)
ax.set_axisbelow(True)
leg = ax.legend(loc="lower left", bbox_to_anchor=(0.02, 0.28),
                fontsize=8.5, frameon=False, labelcolor=INK2)

fig.tight_layout()
out = "results/flagship_replication/seed_study.png"
fig.savefig(out, facecolor=SURFACE)
print("wrote", out)
