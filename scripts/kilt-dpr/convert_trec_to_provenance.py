"""TREC run → KILT provenance json.

Reference: /root/reference/scripts/kilt-dpr/convert_trec_to_provenance.py:34-46.
"""

import argparse
import csv
import json


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trec_file", type=str, required=True)
    parser.add_argument("--kilt_queries_file", type=str, default=None)
    parser.add_argument("--passage_collection", type=str, required=True)
    parser.add_argument("--output_provenance_file", type=str, required=True)
    args = parser.parse_args()

    queries = []
    if args.kilt_queries_file is not None:
        with open(args.kilt_queries_file) as f:
            queries = [json.loads(line) for line in f]

    pid2content = []
    with open(args.passage_collection) as f:
        reader = csv.reader(f, delimiter="\t")
        next(reader)  # header
        for i, row in enumerate(reader):
            pid, text, wikipedia_title, wikipedia_id = row[0], row[1], row[2], row[3]
            assert int(pid) == i, f"non-contiguous pid {pid} at line {i}"
            pid2content.append({
                "text": text,
                "wikipedia_title": wikipedia_title,
                "wikipedia_id": wikipedia_id,
            })

    provenance = {}
    last_qid = None
    with open(args.trec_file) as f:
        for line in f:
            qid, _, pid, rank, score, _ = line.split()
            real_qid = queries[int(qid) - 1]["id"] if queries else str(qid)
            if qid != last_qid:
                provenance[real_qid] = []
                last_qid = qid
            entry = dict(pid2content[int(pid)])
            entry["score"] = score
            provenance[real_qid].append(entry)

    with open(args.output_provenance_file, "w") as f:
        json.dump(provenance, f, indent=4)
    print(f"wrote provenance for {len(provenance)} queries")


if __name__ == "__main__":
    main()
