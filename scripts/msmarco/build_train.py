"""Build MS MARCO tokenized train shards from qrels + a negatives tsv.

Reference: /root/reference/scripts/msmarco/build_train.py:31-74. Input
``negative_file`` lines: ``qid\tnegid1,negid2,...``; output: shuffled
n_sample negatives per query, tokenized jsonl in 45k-line shards.
"""

import random
from argparse import ArgumentParser
from multiprocessing import Pool

from openmatch_tpu.data.preprocessor import (
    ShardedJsonlWriter,
    TrainPreProcessor,
    read_collection_tsv,
    read_qrel,
    read_queries,
)


def main():
    parser = ArgumentParser()
    parser.add_argument("--tokenizer_name", required=True)
    parser.add_argument("--negative_file", required=True)
    parser.add_argument("--qrels", required=True)
    parser.add_argument("--queries", required=True)
    parser.add_argument("--collection", required=True)
    parser.add_argument("--save_to", required=True)
    parser.add_argument("--doc_template", type=str, default=None)
    parser.add_argument("--query_template", type=str, default=None)
    parser.add_argument("--truncate", type=int, default=128)
    parser.add_argument("--n_sample", type=int, default=30)
    parser.add_argument("--mp_chunk_size", type=int, default=500)
    parser.add_argument("--shard_size", type=int, default=45000)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()

    from transformers import AutoTokenizer

    rng = random.Random(args.seed)
    qrel = read_qrel(args.qrels)
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer_name, use_fast=True)
    processor = TrainPreProcessor(
        queries=read_queries(args.queries),
        collection=read_collection_tsv(args.collection),
        tokenizer=tokenizer,
        doc_max_len=args.truncate,
        doc_template=args.doc_template,
        query_template=args.query_template,
        allow_not_found=True,
    )

    def read_lines():
        with open(args.negative_file) as nf:
            for line in nf:
                q, nn = line.strip().split("\t")
                nn = nn.split(",")
                rng.shuffle(nn)
                yield q, qrel[q], nn[: args.n_sample]

    writer = ShardedJsonlWriter(args.save_to, args.shard_size)
    with Pool() as p:
        for x in p.imap(processor.process_one, read_lines(), chunksize=args.mp_chunk_size):
            writer.write(x)
    writer.close()


if __name__ == "__main__":
    main()
