"""Paired SAM diff: key = (name, mate1/mate2 bit)."""
import sys

def parse(path, server=False):
    recs = {}
    for line in open(path):
        if line.startswith("@"): continue
        f = line.rstrip("\n").split("\t")
        name = f[0].split("/")[0] if server else f[0]
        flag = int(f[1])
        mate = 1 if flag & 0x40 else 2
        tags = {t.split(":")[0]: t.split(":", 2)[2] for t in f[11:]}
        recs[(name, mate)] = dict(
            flag=flag, pos=int(f[3]), mapq=int(f[4]), cigar=f[5],
            rnext=f[6], pnext=int(f[7]), tlen=int(f[8]),
            AS=tags.get("AS"), XS=tags.get("XS"), NM=tags.get("NM"),
            MD=tags.get("MD"), YS=tags.get("YS"), YT=tags.get("YT"))
    return recs

def main(golden, mine, n_ex=3):
    g = parse(golden, server=True)
    m = parse(mine)
    fields = ["flag","pos","mapq","cigar","rnext","pnext","tlen","AS","XS","NM","MD","YS","YT"]
    mismatch = {f: 0 for f in fields}
    full = 0
    ex = {f: [] for f in fields}
    missing = 0
    for k in g:
        if k not in m:
            missing += 1; continue
        ok = True
        for f in fields:
            if g[k][f] != m[k][f]:
                mismatch[f] += 1; ok = False
                if len(ex[f]) < n_ex: ex[f].append((k, g[k][f], m[k][f]))
        full += ok
    print(f"identical: {full}/{len(g)} = {100*full/len(g):.2f}%  missing={missing}")
    print("mismatches:", {f: c for f, c in mismatch.items() if c})
    for f, e in ex.items():
        if e: print(f, e)
    return full, len(g)

if __name__ == "__main__":
    main(*sys.argv[1:3])
