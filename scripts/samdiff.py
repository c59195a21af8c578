"""Field-by-field SAM diff vs the golden reference output."""
import sys

def parse(path, server=False):
    recs = {}
    for line in open(path):
        if line.startswith("@"): continue
        f = line.rstrip("\n").split("\t")
        name = f[0].split("/")[0] if server else f[0]
        tags = {t.split(":")[0]: t.split(":", 2)[2] for t in f[11:]}
        recs[name] = dict(flag=int(f[1]), pos=int(f[3]), mapq=int(f[4]),
                          cigar=f[5], AS=tags.get("AS"), XS=tags.get("XS"),
                          NM=tags.get("NM"), MD=tags.get("MD"),
                          XM=tags.get("XM"))
    return recs

def main(golden, mine, n_examples=3):
    g = parse(golden, server=True)
    m = parse(mine)
    fields = ["flag", "pos", "mapq", "cigar", "AS", "XS", "NM", "MD", "XM"]
    mismatch = {f: 0 for f in fields}
    full = 0
    examples = {f: [] for f in fields}
    for k in g:
        if k not in m:
            print("missing:", k); continue
        ok = True
        for f in fields:
            if g[k][f] != m[k][f]:
                mismatch[f] += 1; ok = False
                if len(examples[f]) < n_examples:
                    examples[f].append((k, g[k][f], m[k][f]))
        full += ok
    print(f"identical: {full}/{len(g)} = {100*full/len(g):.2f}%")
    print("mismatches:", {f: c for f, c in mismatch.items() if c})
    for f, ex in examples.items():
        if ex:
            print(f, ex)
    return full, len(g)

if __name__ == "__main__":
    main(*sys.argv[1:3])
