"""Data-alignment diagnostic for VILANRO waypoint datasets (round 5).

Pure numpy, no learning: for each sample, parse the instruction's color,
find blobs of that color in the stored image, locate the EE cross, compute
the absolute endpoint = ee_xy + w_end (waypoints are start-relative,
collect.py --waypoints), and measure the distance from the endpoint to the
instructed blob vs to every other object blob.

Why this exists: round 4 concluded the VILANRO grounding failure was
"data-bounded" from a ~0.15 m supervised probe plateau.  This diagnostic
tests the data DIRECTLY — if the (image, instruction) -> endpoint map is
carried by the data, the endpoint must land on the instructed object's
blob.  Measured on D1way_r4 (64px): median 1.5 cm, endpoint nearer to the
instructed object than to any distractor in 98.4% of samples — i.e. the
map IS learnable and the round-4 "ceiling" was a probe-architecture
artifact (see benchmarks/vilanro_supervised_ceiling.py --arch film).

    python benchmarks/vilanro_alignment_diag.py data/vilanro/D1way_r5
"""
import pickle, sys
import numpy as np

d = sys.argv[1] if len(sys.argv) > 1 else "data/vilanro/D1way_r4"
imgs = pickle.load(open(f"{d}/image_final.pkl", "rb"))
ins = pickle.load(open(f"{d}/instructions_final.pkl", "rb"))
trs = pickle.load(open(f"{d}/endeff_actions_final.pkl", "rb"))
print("N =", len(imgs), "img shape", np.asarray(imgs[0]).shape)

COLOR_MAP = {"red": (200, 40, 40), "green": (40, 180, 60),
             "blue": (40, 90, 210), "yellow": (230, 210, 60),
             "purple": (150, 60, 180), "orange": (240, 140, 40)}
WS = 0.6  # workspace width (m), [-0.3, 0.3]

def px_to_world(x, y, size):
    return (x / (size - 1) - 0.5) * WS, (y / (size - 1) - 0.5) * WS

def blobs_of_color(img, rgb):
    m = (np.abs(img.astype(int) - np.array(rgb)).sum(-1) < 30)
    ys, xs = np.nonzero(m)
    if len(xs) == 0:
        return []
    # cluster by simple connected grouping on sorted coords (objects are small)
    pts = np.stack([xs, ys], 1)
    clusters = []
    used = np.zeros(len(pts), bool)
    for i in range(len(pts)):
        if used[i]:
            continue
        group = [i]
        used[i] = True
        frontier = [i]
        while frontier:
            j = frontier.pop()
            near = np.nonzero((~used) & (np.abs(pts - pts[j]).max(1) <= 2))[0]
            for k in near:
                used[k] = True
                group.append(k)
                frontier.append(k)
        clusters.append(pts[group].mean(0))
    return clusters

def ee_xy(img):
    m = (img.astype(int).sum(-1) < 90)  # dark cross (20,20,20)
    ys, xs = np.nonzero(m)
    if len(xs) == 0:
        return None
    return xs.mean(), ys.mean()

rng = np.random.default_rng(0)
idx = rng.choice(len(imgs), size=min(500, len(imgs)), replace=False)
d_goal, d_other, n_amb, n_noee = [], [], 0, 0
nearest_ok = 0
for i in idx:
    img = np.asarray(imgs[i])
    size = img.shape[0]
    words = ins[i].split()
    color = next(w for w in words if w in COLOR_MAP)
    w_end = np.asarray(trs[i])[-1, :3]
    ee = ee_xy(img)
    if ee is None:
        n_noee += 1
        continue
    ee_w = px_to_world(*ee, size)
    end_w = np.array([ee_w[0] + w_end[0], ee_w[1] + w_end[1]])
    cand = blobs_of_color(img, COLOR_MAP[color])
    if len(cand) != 1:
        n_amb += 1
        continue
    gx, gy = px_to_world(*cand[0], size)
    dg = np.hypot(end_w[0] - gx, end_w[1] - gy)
    d_goal.append(dg)
    # other colored blobs
    others = []
    for c, rgb in COLOR_MAP.items():
        if c == color:
            continue
        for b in blobs_of_color(img, rgb):
            ox, oy = px_to_world(*b, size)
            others.append(np.hypot(end_w[0] - ox, end_w[1] - oy))
    if others:
        d_other.append(min(others))
        if dg < min(others):
            nearest_ok += 1

d_goal = np.array(d_goal); d_other = np.array(d_other)
print(f"usable {len(d_goal)}, ambiguous-color {n_amb}, no-EE {n_noee}")
print(f"endpoint->instructed-blob dist: median {np.median(d_goal):.4f} "
      f"mean {d_goal.mean():.4f} p90 {np.percentile(d_goal,90):.4f}")
if len(d_other):
    print(f"endpoint->nearest-OTHER blob: median {np.median(d_other):.4f}")
    print(f"endpoint nearer to instructed than any other: "
          f"{nearest_ok}/{len(d_other)} = {nearest_ok/len(d_other)*100:.1f}%")
