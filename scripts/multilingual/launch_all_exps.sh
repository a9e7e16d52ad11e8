#!/usr/bin/env bash
# Launch the full MKQA experiment matrix (reference
# scripts/multilingual/launch_all_exps.sh): one run per language x retrieval
# setting. Adapt runexp() to your scheduler (sbatch/xmanager/plain).
set -euo pipefail

exp_folder=${EXP_FOLDER:?set EXP_FOLDER to the experiments output folder}
GENERATOR=${GENERATOR:-command-r-35b}

runexp() {
    label=$1
    shift
    echo "$@ ++experiments_folder=$exp_folder run_name=$label"
    # replace 'echo' above with your scheduler wrapper to actually launch
}

for lang in ar zh fi fr de ja it ko pt ru es th; do
    # closed-book (no retrieval)
    runexp "mkqa_noret_${lang}" python3 bergen.py generator="$GENERATOR" \
        dataset="mkqa/mkqa_${lang}.retrieve_en" prompt="basic_translated_langspec/${lang}"
    # retrieval from English wikipedia
    runexp "mkqa_enret_${lang}" python3 bergen.py generator="$GENERATOR" \
        retriever=bge-m3 reranker=bge-m3 \
        dataset="mkqa/mkqa_${lang}.retrieve_en" prompt="basic_translated_langspec/${lang}"
    # retrieval from the user-language wikipedia
    runexp "mkqa_langret_${lang}" python3 bergen.py generator="$GENERATOR" \
        retriever=bge-m3 reranker=bge-m3 \
        dataset="mkqa/mkqa_${lang}.retrieve_${lang}" prompt="basic_translated_langspec/${lang}"
    # retrieval from English + user language
    runexp "mkqa_enlangret_${lang}" python3 bergen.py generator="$GENERATOR" \
        retriever=bge-m3 reranker=bge-m3 \
        dataset="mkqa/mkqa_${lang}.retrieve_en_${lang}" prompt="basic_translated_langspec/${lang}"
    # retrieval from the merged multilingual corpus
    runexp "mkqa_allret_${lang}" python3 bergen.py generator="$GENERATOR" \
        retriever=bge-m3 reranker=bge-m3 \
        dataset="mkqa/mkqa_${lang}.retrieve_all" prompt="basic_translated_langspec/${lang}"
done
