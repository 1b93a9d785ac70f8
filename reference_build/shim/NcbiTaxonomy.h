// Shim: NCBI-taxonomy base class matching the mmseqs NcbiTaxonomy
// interface that Metabuli's TaxonomyWrapper extends.  Euler-tour +
// sparse-table RMQ LCA over dense node ids: D maps TaxID -> dense id,
// E/L are the Euler tour node ids and levels, H the first tour index
// per dense id, M the RMQ sparse table (layout fixed by
// TaxonomyWrapper::serialize/unserialize, TaxonomyWrapper.cpp:289-420).
#ifndef SHIM_NCBITAXONOMY_H
#define SHIM_NCBITAXONOMY_H

#include <cstddef>
#include <cstring>
#include <map>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "StringBlock.h"

#ifndef SSTR
#define SSTR(x) std::to_string(x)
#endif

typedef int TaxID;

struct TaxonNode {
    int id;            // dense node id
    int taxId;
    int parentTaxId;
    size_t rankIdx;
    size_t nameIdx;

    TaxonNode() : id(0), taxId(0), parentTaxId(0), rankIdx(0), nameIdx(0) {}
    TaxonNode(int id, int taxId, int parentTaxId, size_t rankIdx,
              size_t nameIdx)
        : id(id), taxId(taxId), parentTaxId(parentTaxId), rankIdx(rankIdx),
          nameIdx(nameIdx) {}

    void print() const;
};

// free helper used unqualified by IndexCreator.cpp (mmseqs heritage)
inline std::vector<std::string> splitByDelimiter(const std::string &s,
                                                 const std::string &delimiter,
                                                 int maxCol) {
    std::vector<std::string> result;
    size_t prev = 0, pos = 0;
    int i = 0;
    do {
        pos = s.find(delimiter, prev);
        if (pos == std::string::npos) pos = s.length();
        result.emplace_back(s.substr(prev, pos - prev));
        prev = pos + delimiter.length();
        i++;
    } while (pos < s.length() && prev < s.length() && i < maxCol);
    return result;
}

struct TaxonCounts {
    unsigned int taxCount = 0;    // reads assigned to this taxon directly
    unsigned int cladeCount = 0;  // reads in the whole clade
    std::vector<TaxID> children;
};

struct WeightedTaxHit {
    TaxID taxon;
    float weight;

    WeightedTaxHit(const TaxID taxon, const float weight, const int voteMode)
        : taxon(taxon), weight(weight) {
        (void)voteMode;
    }
};

struct WeightedTaxResult {
    TaxID taxon;
    size_t assignedSeqs;
    size_t unassignedSeqs;
    size_t seqsAgreeWithSelectedTaxon;
    double selectedPercent;

    WeightedTaxResult(TaxID taxon, size_t assignedSeqs, size_t unassignedSeqs,
                      size_t seqsAgree, double selectedPercent)
        : taxon(taxon), assignedSeqs(assignedSeqs),
          unassignedSeqs(unassignedSeqs),
          seqsAgreeWithSelectedTaxon(seqsAgree),
          selectedPercent(selectedPercent) {}
};

class NcbiTaxonomy {
public:
    static const int SERIALIZATION_VERSION;

    NcbiTaxonomy() : taxonNodes(NULL), maxNodes(0), maxTaxID(0), D(NULL),
                     E(NULL), L(NULL), H(NULL), M(NULL), block(NULL),
                     externalData(false), mmapData(NULL), mmapSize(0) {}

    NcbiTaxonomy(const std::string &namesFile, const std::string &nodesFile,
                 const std::string &mergedFile);

    NcbiTaxonomy(TaxonNode *taxonNodes, size_t maxNodes, int maxTaxID,
                 int *D, int *E, int *L, int *H, int **M,
                 StringBlock<unsigned int> *block)
        : taxonNodes(taxonNodes), maxNodes(maxNodes), maxTaxID(maxTaxID),
          D(D), E(E), L(L), H(H), M(M), block(block), externalData(true),
          mmapData(NULL), mmapSize(0) {}

    virtual ~NcbiTaxonomy();

    const TaxonNode *taxonNode(TaxID taxonId, bool fail = true) const;
    bool nodeExists(TaxID taxId) const;
    const char *getString(size_t blockIdx) const;

    TaxID LCA(TaxID taxonA, TaxID taxonB) const;
    const TaxonNode *LCA(const std::vector<TaxID> &taxa) const;

    bool IsAncestor(TaxID ancestor, TaxID child);

    static int findRankIndex(const std::string &rank);
    static std::string findShortRank(const std::string &rank);

    std::unordered_map<TaxID, std::vector<TaxID>> getParentToChildren() const;

    std::unordered_map<TaxID, TaxonCounts> getCladeCounts(
        const std::unordered_map<TaxID, unsigned int> &taxonCounts,
        const std::unordered_map<TaxID, std::vector<TaxID>> &parentToChildren)
        const;

    WeightedTaxResult weightedMajorityLCA(
        const std::vector<WeightedTaxHit> &setTaxa, const float majorityCutoff);

    // members are protected in mmseqs with the wrapper as a friend; the
    // wrapper accesses them directly, so they live protected here too
protected:
    void loadNodes(std::vector<TaxonNode> &tmpNodes,
                   const std::string &nodesFile);
    void loadMerged(const std::string &mergedFile);
    void loadNames(std::vector<TaxonNode> &tmpNodes,
                   const std::string &namesFile);

    size_t nodeId(TaxID taxId) const;

    void elh(std::vector<std::vector<TaxID>> const &children, TaxID taxId,
             int level, std::vector<int> &tmpE, std::vector<int> &tmpL);
    void computeSparseTable();
    int RangeMinimumQuery(int i, int j) const;
    int lcaHelper(int i, int j) const;

    TaxonNode *taxonNodes;
    size_t maxNodes;
    int maxTaxID;
    int *D;       // TaxID -> dense node id
    int *E;       // Euler tour of dense node ids [2*maxNodes]
    int *L;       // levels along the tour [2*maxNodes]
    int *H;       // dense id -> first tour index
    int **M;      // RMQ sparse table [2*maxNodes][log2+1]
    StringBlock<unsigned int> *block;
    bool externalData;
    char *mmapData;
    size_t mmapSize;
};

#endif
