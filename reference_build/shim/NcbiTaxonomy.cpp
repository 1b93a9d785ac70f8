// Shim NcbiTaxonomy implementation (see NcbiTaxonomy.h).
#include "NcbiTaxonomy.h"

#include <algorithm>
#include <cstdlib>
#include <fstream>
#include <iostream>

#include "Debug.h"
#include "MathUtil.h"
#include "Util.h"

const int NcbiTaxonomy::SERIALIZATION_VERSION = 2;

void TaxonNode::print() const {
    std::cout << taxId << "\t" << parentTaxId << "\t" << rankIdx << "\t"
              << nameIdx << std::endl;
}

NcbiTaxonomy::~NcbiTaxonomy() {
    if (!externalData) {
        delete[] taxonNodes;
        delete[] D;
        delete[] E;
        delete[] L;
        delete[] H;
        if (M) {
            delete[] M[0];
            delete[] M;
        }
        delete block;
    } else if (M) {
        delete[] M;   // row-pointer array is always owned
    }
}

size_t NcbiTaxonomy::nodeId(TaxID taxonId) const {
    if (taxonId < 0 || taxonId > maxTaxID || D[taxonId] == -1) {
        Debug(Debug::ERROR) << "Invalid node " << taxonId << "!\n";
        EXIT(EXIT_FAILURE);
    }
    return D[taxonId];
}

bool NcbiTaxonomy::nodeExists(TaxID taxId) const {
    return taxId >= 0 && taxId <= maxTaxID && D[taxId] != -1;
}

const TaxonNode *NcbiTaxonomy::taxonNode(TaxID taxonId, bool fail) const {
    if (taxonId == 0 || !nodeExists(taxonId)) {
        if (fail) {
            Debug(Debug::ERROR) << "Invalid node " << taxonId << "!\n";
            EXIT(EXIT_FAILURE);
        }
        return NULL;
    }
    return &(taxonNodes[nodeId(taxonId)]);
}

const char *NcbiTaxonomy::getString(size_t blockIdx) const {
    return block->getString(blockIdx);
}

void NcbiTaxonomy::loadNodes(std::vector<TaxonNode> &tmpNodes,
                             const std::string &nodesFile) {
    std::ifstream ss(nodesFile);
    if (ss.fail()) {
        Debug(Debug::ERROR) << "File " << nodesFile << " not found!\n";
        EXIT(EXIT_FAILURE);
    }
    std::map<TaxID, int> Dm;
    int maxTaxon = 0;
    std::string line;
    while (std::getline(ss, line)) {
        std::vector<std::string> result = Util::split(line, "\t|\t");
        if (result.size() < 3) {
            Debug(Debug::ERROR) << "Invalid nodes file!\n";
            EXIT(EXIT_FAILURE);
        }
        TaxID taxId = (TaxID)strtol(result[0].c_str(), NULL, 10);
        TaxID parentTaxId = (TaxID)strtol(result[1].c_str(), NULL, 10);
        maxTaxon = std::max(maxTaxon, taxId);
        size_t rankIdx = block->append(result[2].c_str(), result[2].size());
        int id = (int)tmpNodes.size();
        Dm.emplace(taxId, id);
        tmpNodes.emplace_back(id, taxId, parentTaxId, rankIdx, (size_t)-1);
    }
    maxTaxID = maxTaxon;
    D = new int[maxTaxID + 1];
    std::fill_n(D, maxTaxID + 1, -1);
    for (std::map<TaxID, int>::iterator it = Dm.begin(); it != Dm.end();
         ++it) {
        D[it->first] = it->second;
    }
}

void NcbiTaxonomy::loadMerged(const std::string &mergedFile) {
    std::ifstream ss(mergedFile);
    if (ss.fail()) {
        return;   // merged.dmp is optional
    }
    std::string line;
    while (std::getline(ss, line)) {
        std::vector<std::string> result = Util::split(line, "\t|");
        if (result.size() < 2) {
            continue;
        }
        TaxID oldId = (TaxID)strtol(result[0].c_str(), NULL, 10);
        TaxID mergedId = (TaxID)strtol(result[1].c_str(), NULL, 10);
        if (oldId <= maxTaxID && D[oldId] == -1 && D[mergedId] != -1) {
            D[oldId] = D[mergedId];
        }
    }
}

void NcbiTaxonomy::loadNames(std::vector<TaxonNode> &tmpNodes,
                             const std::string &namesFile) {
    std::ifstream ss(namesFile);
    if (ss.fail()) {
        Debug(Debug::ERROR) << "File " << namesFile << " not found!\n";
        EXIT(EXIT_FAILURE);
    }
    std::string line;
    while (std::getline(ss, line)) {
        if (line.find("scientific name") == std::string::npos) {
            continue;
        }
        std::vector<std::string> result = Util::split(line, "\t|\t");
        if (result.size() < 2) {
            continue;
        }
        TaxID taxId = (TaxID)strtol(result[0].c_str(), NULL, 10);
        if (!nodeExists(taxId)) {
            continue;
        }
        tmpNodes[nodeId(taxId)].nameIdx =
            block->append(result[1].c_str(), result[1].size());
    }
}

NcbiTaxonomy::NcbiTaxonomy(const std::string &namesFile,
                           const std::string &nodesFile,
                           const std::string &mergedFile) {
    externalData = false;
    mmapData = NULL;
    mmapSize = 0;
    block = new StringBlock<unsigned int>();
    std::vector<TaxonNode> tmpNodes;
    loadNodes(tmpNodes, nodesFile);
    loadMerged(mergedFile);
    loadNames(tmpNodes, namesFile);
    maxNodes = tmpNodes.size();
    taxonNodes = new TaxonNode[maxNodes];
    std::copy(tmpNodes.begin(), tmpNodes.end(), taxonNodes);

    std::vector<int> tmpE;
    tmpE.reserve(maxNodes * 2);
    std::vector<int> tmpL;
    tmpL.reserve(maxNodes * 2);
    H = new int[maxNodes];
    std::fill(H, H + maxNodes, 0);
    std::vector<std::vector<TaxID>> children(maxNodes);
    for (size_t i = 0; i < maxNodes; ++i) {
        if (taxonNodes[i].parentTaxId != taxonNodes[i].taxId) {
            children[nodeId(taxonNodes[i].parentTaxId)].push_back(
                taxonNodes[i].taxId);
        }
    }
    elh(children, 1, 0, tmpE, tmpL);
    tmpE.resize(maxNodes * 2, 0);
    tmpL.resize(maxNodes * 2, 0);
    E = new int[maxNodes * 2];
    std::copy(tmpE.begin(), tmpE.end(), E);
    L = new int[maxNodes * 2];
    std::copy(tmpL.begin(), tmpL.end(), L);
    size_t dimension = maxNodes * 2;
    int k = (int)(MathUtil::flog2((unsigned int)dimension)) + 1;
    M = new int *[dimension];
    M[0] = new int[dimension * k]();
    for (size_t i = 1; i < dimension; ++i) {
        M[i] = M[i - 1] + k;
    }
    computeSparseTable();
}

void NcbiTaxonomy::elh(std::vector<std::vector<TaxID>> const &children,
                       TaxID taxId, int level, std::vector<int> &tmpE,
                       std::vector<int> &tmpL) {
    int id = (int)nodeId(taxId);
    if (H[id] == 0) {
        H[id] = (int)tmpE.size();
    }
    tmpE.emplace_back(id);
    tmpL.emplace_back(level);
    for (TaxID child : children[id]) {
        elh(children, child, level + 1, tmpE, tmpL);
        tmpE.emplace_back(id);
        tmpL.emplace_back(level);
    }
}

void NcbiTaxonomy::computeSparseTable() {
    size_t N = maxNodes * 2;
    int k = (int)(MathUtil::flog2((unsigned int)N)) + 1;
    for (size_t i = 0; i < N; ++i) {
        M[i][0] = (int)i;
    }
    for (int j = 1; j < k; ++j) {
        size_t span = (size_t)1 << j;
        if (span > N) {
            break;
        }
        for (size_t i = 0; i + span <= N; ++i) {
            int a = M[i][j - 1];
            int b = M[i + (span >> 1)][j - 1];
            M[i][j] = (L[a] <= L[b]) ? a : b;
        }
    }
}

int NcbiTaxonomy::RangeMinimumQuery(int i, int j) const {
    if (i > j) {
        std::swap(i, j);
    }
    int span = j - i + 1;
    int k = span <= 1 ? 0 : (int)MathUtil::flog2((unsigned int)span);
    int a = M[i][k];
    int b = M[j - (1 << k) + 1][k];
    return (L[a] <= L[b]) ? a : b;
}

int NcbiTaxonomy::lcaHelper(int i, int j) const {
    return RangeMinimumQuery(H[i], H[j]);
}

TaxID NcbiTaxonomy::LCA(TaxID taxonA, TaxID taxonB) const {
    if (!nodeExists(taxonA)) {
        return taxonB;
    }
    if (!nodeExists(taxonB)) {
        return taxonA;
    }
    int id = E[lcaHelper((int)nodeId(taxonA), (int)nodeId(taxonB))];
    return taxonNodes[id].taxId;
}

const TaxonNode *NcbiTaxonomy::LCA(const std::vector<TaxID> &taxa) const {
    std::vector<TaxID>::const_iterator it = taxa.begin();
    while (it != taxa.end() && !nodeExists(*it)) {
        Debug(Debug::WARNING) << "No node for taxID " << *it << "\n";
        ++it;
    }
    if (it == taxa.end()) {
        return NULL;
    }
    int red = (int)nodeId(*it++);
    for (; it != taxa.end(); ++it) {
        if (nodeExists(*it)) {
            red = E[lcaHelper(red, (int)nodeId(*it))];
        } else {
            Debug(Debug::WARNING) << "No node for taxID " << *it << "\n";
        }
    }
    return &(taxonNodes[red]);
}

bool NcbiTaxonomy::IsAncestor(TaxID ancestor, TaxID child) {
    if (ancestor == child) {
        return true;
    }
    if (ancestor == 0 || child == 0) {
        return false;
    }
    if (!nodeExists(ancestor) || !nodeExists(child)) {
        return false;
    }
    return LCA(ancestor, child) == ancestor;
}

int NcbiTaxonomy::findRankIndex(const std::string &rank) {
    static const std::map<std::string, int> ranks = {
        {"forma", 1}, {"varietas", 2}, {"subspecies", 3}, {"species", 4},
        {"species subgroup", 5}, {"species group", 6}, {"subgenus", 7},
        {"genus", 8}, {"subtribe", 9}, {"tribe", 10}, {"subfamily", 11},
        {"family", 12}, {"superfamily", 13}, {"parvorder", 14},
        {"infraorder", 15}, {"suborder", 16}, {"order", 17},
        {"superorder", 18}, {"infraclass", 19}, {"subclass", 20},
        {"class", 21}, {"superclass", 22}, {"subphylum", 23}, {"phylum", 24},
        {"superphylum", 25}, {"subkingdom", 26}, {"kingdom", 27},
        {"superkingdom", 28}, {"domain", 28}, {"realm", 28}};
    std::map<std::string, int>::const_iterator it = ranks.find(rank);
    if (it != ranks.end()) {
        return it->second;
    }
    return -1;
}

std::string NcbiTaxonomy::findShortRank(const std::string &rank) {
    static const std::map<std::string, std::string> shortRanks = {
        {"species", "s"}, {"genus", "g"}, {"family", "f"}, {"order", "o"},
        {"class", "c"}, {"phylum", "p"}, {"kingdom", "k"},
        {"superkingdom", "d"}, {"domain", "d"}, {"realm", "r"}};
    std::map<std::string, std::string>::const_iterator it =
        shortRanks.find(rank);
    if (it != shortRanks.end()) {
        return it->second;
    }
    return "-";
}

std::unordered_map<TaxID, std::vector<TaxID>>
NcbiTaxonomy::getParentToChildren() const {
    std::unordered_map<TaxID, std::vector<TaxID>> result;
    result.reserve(maxNodes);
    for (size_t i = 0; i < maxNodes; ++i) {
        const TaxonNode &node = taxonNodes[i];
        if (node.parentTaxId != node.taxId) {
            result[node.parentTaxId].push_back(node.taxId);
        }
    }
    return result;
}

std::unordered_map<TaxID, TaxonCounts> NcbiTaxonomy::getCladeCounts(
    const std::unordered_map<TaxID, unsigned int> &taxonCounts,
    const std::unordered_map<TaxID, std::vector<TaxID>> &parentToChildren)
    const {
    (void)parentToChildren;
    // accumulate clade counts bottom-up along parent chains, then attach
    // children links for every node with a non-zero clade count
    std::unordered_map<TaxID, TaxonCounts> out;
    out.reserve(taxonCounts.size() * 4);
    for (std::unordered_map<TaxID, unsigned int>::const_iterator it =
             taxonCounts.begin();
         it != taxonCounts.end(); ++it) {
        out[it->first].taxCount = it->second;
        if (it->first == 0 || !nodeExists(it->first)) {
            // unclassified (taxid 0) and unknown ids carry their own
            // counts with no parent walk (mmseqs getCladeCounts keeps
            // them so Reporter emits the "unclassified" node)
            out[it->first].cladeCount += it->second;
            continue;
        }
        TaxID node = it->first;
        while (true) {
            out[node].cladeCount += it->second;
            const TaxonNode *tn = taxonNode(node, false);
            if (tn == NULL || tn->parentTaxId == node) {
                break;
            }
            node = tn->parentTaxId;
        }
    }
    for (std::unordered_map<TaxID, TaxonCounts>::iterator it = out.begin();
         it != out.end(); ++it) {
        const TaxonNode *tn = taxonNode(it->first, false);
        if (tn != NULL && tn->parentTaxId != it->first) {
            std::unordered_map<TaxID, TaxonCounts>::iterator par =
                out.find(tn->parentTaxId);
            if (par != out.end()) {
                par->second.children.push_back(it->first);
            }
        }
    }
    // deterministic child order (Reporter ties resolve identically run
    // to run): ascending taxid
    for (std::unordered_map<TaxID, TaxonCounts>::iterator it = out.begin();
         it != out.end(); ++it) {
        std::sort(it->second.children.begin(), it->second.children.end());
    }
    return out;
}

WeightedTaxResult NcbiTaxonomy::weightedMajorityLCA(
    const std::vector<WeightedTaxHit> &setTaxa, const float majorityCutoff) {
    std::unordered_map<TaxID, double> acc;
    double total = 0.0;
    size_t assigned = 0;
    for (const WeightedTaxHit &hit : setTaxa) {
        if (hit.taxon == 0 || !nodeExists(hit.taxon)) {
            continue;
        }
        ++assigned;
        total += hit.weight;
        TaxID node = hit.taxon;
        while (true) {
            acc[node] += hit.weight;
            const TaxonNode *tn = taxonNode(node, false);
            if (tn == NULL || tn->parentTaxId == node) {
                break;
            }
            node = tn->parentTaxId;
        }
    }
    TaxID best = 0;
    int bestDepth = -1;
    double bestWeight = 0.0;
    for (std::unordered_map<TaxID, double>::const_iterator it = acc.begin();
         it != acc.end(); ++it) {
        if (it->second >= majorityCutoff * total) {
            int depth = L[H[nodeId(it->first)]];
            if (depth > bestDepth ||
                (depth == bestDepth && it->second > bestWeight)) {
                best = it->first;
                bestDepth = depth;
                bestWeight = it->second;
            }
        }
    }
    double percent = total > 0 ? bestWeight / total : 0.0;
    return WeightedTaxResult(best, assigned, setTaxa.size() - assigned, 0,
                             percent);
}
