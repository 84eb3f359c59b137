#!/usr/bin/env python3
"""One-shot refactor: split queries/Registry.scala (14k+ lines) into
per-domain trait files chained by inheritance, keeping the `queries`
ListMap verbatim (exact registration order) and regrouping oracleSql
entries per domain (lookup map — order is irrelevant to every consumer).
Run from repo root. Idempotence: not needed (run once, then delete)."""
import re, os, sys

SRC = 'src/main/scala/graft/queries/Registry.scala'
src = open(SRC).read()
lines = src.split('\n')

# ---- region boundaries -------------------------------------------------
def find_line(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit('not found')

obj_i = find_line(lambda l: l.startswith('object Registry {'))
queries_i = find_line(lambda l: l.startswith('  val queries: ListMap'))
# attached comment above queries map (walk up over comments/blank)
qmap_start = queries_i
while qmap_start - 1 > 0 and re.match(r'^\s*(/\*\*|\*|//|\*/)', lines[qmap_start - 1]):
    qmap_start -= 1
qmap_end = find_line(lambda l: l == '  )', queries_i)          # inclusive
oracle_i = find_line(lambda l: l.startswith('  val oracleSql: ListMap'), qmap_end)
omap_start = oracle_i
while omap_start - 1 > 0 and re.match(r'^\s*(/\*\*|\*|//|\*/)', lines[omap_start - 1]):
    omap_start -= 1
omap_end = find_line(lambda l: l == '  )', oracle_i)           # inclusive
close_i = find_line(lambda l: l == '}', omap_end)

header = lines[:obj_i]            # package/imports/scaladoc
defs_region = lines[obj_i + 1:qmap_start]
qmap = lines[qmap_start:qmap_end + 1]
omap_body = lines[oracle_i + 1:omap_end]   # entry lines only
tail = lines[omap_end + 1:close_i]
assert all(not t.strip() for t in tail), tail

# ---- parse member blocks ----------------------------------------------
decl_re = re.compile(r'^  (private(\[[a-z]+\])? )?(def|val|lazy val) ([A-Za-z][A-Za-z0-9_]*)')
decls = [(i, decl_re.match(l).group(4)) for i, l in enumerate(defs_region)
         if decl_re.match(l)]
blocks = []   # (name, [lines])
for k, (i, name) in enumerate(decls):
    start = i
    while start - 1 >= 0 and re.match(r'^\s*(/\*\*|\*|//|\*/)', defs_region[start - 1]):
        start -= 1
    end = decls[k + 1][0] if k + 1 < len(decls) else len(defs_region)
    if k + 1 < len(decls):
        nxt = decls[k + 1][0]
        while nxt - 1 >= 0 and re.match(r'^\s*(/\*\*|\*|//|\*/)', defs_region[nxt - 1]):
            nxt -= 1
        end = nxt
    blocks.append((name, defs_region[start:end]))
# sanity: nothing dropped
joined = '\n'.join(l for _, b in blocks for l in b)
orig = '\n'.join(defs_region).strip('\n')
flat = '\n'.join(l for l in orig.split('\n'))
assert len(joined.strip('\n').split('\n')) >= len([l for l in defs_region if l.strip()]) - 5, \
    'block parse dropped non-trivial lines'

# ---- domain classification --------------------------------------------
SIM = set('''llmAnnBrute llmAnnIvf llmAnnLsh llmCosineNearDup llmAnnQuant
llmAnnBatch llmAnnIvfKmeans llmKmeansDet llmKmeansElbow llmAnnIvfDet
llmClusterPurity llmSilhouette llmAnnRecall llmSemDedup llmSemDedupDet
llmAnnPqDet llmAnnPqDetRerank llmAnnIvfPqDet llmAnnIvfPqDetRerank
llmAnnBinary llmCentroidClf llmRandProj llmFeatHash llmDbscan llmPca
llmPcaVar ivfPqDetCtes ivfPqDetContribs ivfPqDetAdc'''.split())
DEDUP = set('''llmExactDedup llmDedupClusters llmClusterBest
llmMinhashNearDup llmSimhashNearDup llmNgramJaccard llmContainment
llmIncrDedup llmSpanDedup llmLineDedup llmRollingFp llmFingerprint
llmCdcChunks llmDupRegions llmFuzzyJoin llmErLinkage llmWinnow
llmWinnowPairs llmWinnowLocate llmCorpusOverlap llmNovelty llmUrlCanon
llmDecontaminate llmBloomDecon llmBlocklist BlocklistPatterns'''.split())
SEARCH = set('''llmPostings llmTfIdf llmBm25 llmSearchBm25 llmSearchHybrid
llmPhraseSearch llmTopNgram llmCooccurPmi llmCollocations llmVocab
llmOovRate llmHeaps llmZipf llmJsd llmSelfBleu llmTermDrift llmRouge2
llmKeywordsTextrank llmReadability llmLangId llmLangidEval llmNfc
llmHtmlExtract llmBoilerplate llmLexdiv llmRepetition llmTokens
llmLmScore llmMinK llmWatermark llmCompressRatio llmCompressRatioDet
llmBpe llmBpeDet llmMaskTokens llmMaskSpans llmMcnemar'''.split())

def classify(n):
    if n in ('t', 'q', 'configure', 'normalizeEmbedding', 'normalizeEventTs'):
        return 'Base'
    if n.startswith(('graph', 'pr', 'layout', 'coPurchase')) or \
       n in ('EdgeTableVersion', 'edgeBuildLock'):
        return 'Graph'
    if n.startswith('stats') or n.startswith('mb'):
        return 'Stats'
    if n.startswith('ts'):
        return 'Ts'
    if n.startswith('agg') or n.startswith('sketch'):
        return 'Agg'
    if n.startswith('mm') or n == 'wavFiles':
        return 'Mm'
    if re.match(r'^[ew][A-Z]', n):
        return 'Event'
    if n in SIM: return 'LlmSim'
    if n in DEDUP: return 'LlmDedup'
    if n in SEARCH: return 'LlmSearch'
    if n.startswith('llm') or n in ('QualityClfWeights', 'QualityClfIntercept'):
        return 'LlmCuration'
    return 'Core'

CHAIN = ['Base', 'Core', 'Agg', 'Stats', 'Ts', 'Event', 'Graph', 'Mm',
         'LlmDedup', 'LlmSearch', 'LlmCuration', 'LlmSim']
by_dom = {d: [] for d in CHAIN}
for name, b in blocks:
    by_dom[classify(name)].append((name, b))

# ---- map query name -> def -> domain, for oracle regrouping -----------
q_entry_re = re.compile(r'^    "(q_[a-z0-9_]+)" -> q\(([A-Za-z0-9]+)\),?$')
name2def = {}
for l in qmap:
    m = q_entry_re.match(l)
    if m:
        name2def[m.group(1)] = m.group(2)
missing = [l for l in qmap if l.strip().startswith('"q_') and not q_entry_re.match(l)]
assert not missing, missing

# ---- parse oracle entries ---------------------------------------------
entry_start_re = re.compile(r'^    "(q_[a-z0-9_]+)" ->')
starts = [(i, entry_start_re.match(l).group(1)) for i, l in enumerate(omap_body)
          if entry_start_re.match(l)]
oentries = []
for k, (i, qn) in enumerate(starts):
    s = i
    while s - 1 >= 0 and re.match(r'^\s*//', omap_body[s - 1]):
        s -= 1
    e = starts[k + 1][0] if k + 1 < len(starts) else len(omap_body)
    if k + 1 < len(starts):
        nxt = starts[k + 1][0]
        while nxt - 1 >= 0 and re.match(r'^\s*//', omap_body[nxt - 1]):
            nxt -= 1
        e = nxt
    oentries.append((qn, omap_body[s:e]))
odom = {d: [] for d in CHAIN}
for qn, b in oentries:
    d = classify(name2def[qn])
    # oracle entries live where their def lives; Base never holds queries
    odom[d].append((qn, b))
assert not odom['Base']

# ---- emit domain files -------------------------------------------------
imports = '\n'.join(header).rstrip('\n')
# strip the object-level scaladoc from header for domain files (keep in Registry)
hdr_lines = header[:]
# find the registry scaladoc start (/** The driver-facing...)
doc_start = next(i for i, l in enumerate(hdr_lines) if l.startswith('/**'))
file_header = '\n'.join(hdr_lines[:doc_start]).rstrip('\n')
registry_doc = '\n'.join(hdr_lines[doc_start:]).rstrip('\n')

DOC = {
 'Base': 'Shared loaders and session setup for every registered query.',
 'Core': 'Reference-parity operators: sources, transforms, pipeline,\n  * store lifecycle, joins, ordering, fee queries.',
 'Agg': 'Aggregation and sketch queries.',
 'Stats': 'Statistical tests and diagnostics.',
 'Ts': 'Time-series queries.',
 'Event': 'Event-stream batch queries (sessionization, funnels, windows).',
 'Graph': 'Graph queries over the co-purchase and supplier-part graphs.',
 'Mm': 'Multimodal (image/audio/video) queries.',
 'LlmDedup': 'LLM-pipeline dedup / fingerprint / decontamination queries.',
 'LlmSearch': 'LLM-pipeline text-analysis / search / tokenization queries.',
 'LlmCuration': 'LLM-pipeline curation: quality, sampling, splits, packing, eval.',
 'LlmSim': 'LLM-pipeline vector similarity: ANN, PQ/IVF, clustering, PCA.',
}

def rewrite_vis(line):
    if line.startswith('  private def '):
        return '  protected def ' + line[len('  private def '):]
    if line.startswith('  private val '):
        return '  protected val ' + line[len('  private val '):]
    if line.startswith('  private lazy val '):
        return '  protected lazy val ' + line[len('  private lazy val '):]
    return line

prev = None
for d in CHAIN:
    fname = f'src/main/scala/graft/queries/Registry{d}.scala'
    ext = f' extends Registry{prev}' if prev else ''
    body = []
    for name, b in by_dom[d]:
        body.extend(rewrite_vis(l) for l in b)
        if body and body[-1].strip():
            body.append('')
    oracle = ''
    if odom[d]:
        parts = []
        for qn, b in odom[d]:
            parts.extend(b)
        oracle = (f'\n  protected val {d[0].lower() + d[1:]}OracleSql: '
                  'ListMap[String, String] = ListMap(\n' +
                  '\n'.join(parts) + '\n  )\n')
    content = (file_header + '\n\n' +
               f'/** {DOC[d]}\n  *\n  * Split from the monolithic Registry'
               ' (round 13); see [[Registry]] for the\n  * registration'
               ' maps and conventions. */\n'
               f'trait Registry{d}{ext} {{\n\n' +
               '\n'.join(body).rstrip('\n') + '\n' + oracle + '}\n')
    open(fname, 'w').write(content)
    print(f'{fname}: {len(content.splitlines())} lines, '
          f'{len(by_dom[d])} members, {len(odom[d])} oracle entries')
    prev = d

# ---- new Registry.scala ------------------------------------------------
oracle_concat = ' ++\n    '.join(
    f'{d[0].lower() + d[1:]}OracleSql' for d in CHAIN if odom[d])
content = (file_header + '\n\n' + registry_doc + '\n' +
           f'object Registry extends Registry{CHAIN[-1]} {{\n\n' +
           '\n'.join(qmap) + '\n\n' +
           '  /** Per-domain oracle fragments, concatenated (pure lookup\n'
           '    * map — iteration order is irrelevant to every consumer;\n'
           '    * RegistrySpec pins key-set equality with `queries`). */\n'
           '  val oracleSql: ListMap[String, String] =\n    ' +
           oracle_concat + '\n}\n')
open(SRC, 'w').write(content)
print(f'{SRC}: {len(content.splitlines())} lines')
